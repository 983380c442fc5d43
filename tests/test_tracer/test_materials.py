"""Material physics parity tests.

Re-hosts test/test_pyrayt/test_pyrayt_materials.py: absorber zeroes the
direction, mirror reflects, glass refracts with correct enter/exit index
bookkeeping and Snell angles, Sellmeier analytic values (scalar, array, and
through a full trace).
"""

import numpy as np
import pytest

import pyrayt_tpu as pyrayt
from pyrayt_tpu import components, materials
from pyrayt_tpu.scene import Sphere, XYPlane
from pyrayt_tpu.tracer.rayset import RaySet


def rayset_towards_x(n=4, y=0.0):
    rs = RaySet.create(n)
    return rs.replace(directions=rs.directions.at[0].set(1.0))


class TestAbsorber:
    def test_zeroes_direction(self):
        surface = XYPlane(material=materials.absorber)
        rs = rayset_towards_x()
        out = materials.absorber.trace(surface, rs)
        assert np.allclose(np.asarray(out.directions), 0.0)

    def test_kind(self):
        assert materials.absorber.kind == materials.KIND_ABSORB


class TestMirror:
    def test_plane_reflection(self):
        surface = XYPlane(material=materials.mirror).rotate_y(-90).move_x(3)
        rs = rayset_towards_x()
        rs = rs.replace(positions=rs.positions.at[0].set(3.0))
        out = materials.mirror.trace(surface, rs)
        dirs = np.asarray(out.directions)
        assert np.allclose(dirs[0], -1.0)
        assert np.allclose(dirs[1:], 0.0)

    def test_oblique_reflection(self):
        surface = XYPlane(material=materials.mirror).rotate_y(-90).move_x(0)
        rs = RaySet.create(1)
        d = np.array([1.0, 1.0, 0.0, 0.0]) / np.sqrt(2)
        rs = rs.replace(directions=rs.directions.at[:, 0].set(d))
        out = materials.mirror.trace(surface, rs)
        expected = np.array([-1.0, 1.0, 0.0, 0.0]) / np.sqrt(2)
        assert np.allclose(np.asarray(out.directions)[:, 0], expected)


class TestGlass:
    def test_entering_updates_index(self):
        # plane at x=0 facing -x; ray entering glass n=1.5
        surface = XYPlane(material=materials.glass["ideal"]).rotate_y(-90)
        rs = rayset_towards_x(n=3)
        out = materials.glass["ideal"].trace(surface, rs)
        assert np.allclose(np.asarray(out.index), 1.5)
        assert np.allclose(np.asarray(out.directions)[0], 1.0)  # normal incidence

    def test_snell_angle(self):
        surface = XYPlane(material=materials.glass["ideal"]).rotate_y(-90)
        rs = RaySet.create(1)
        theta1 = np.deg2rad(30)
        d = np.array([np.cos(theta1), np.sin(theta1), 0.0, 0.0])
        rs = rs.replace(directions=rs.directions.at[:, 0].set(d))
        out = materials.glass["ideal"].trace(surface, rs)
        d_out = np.asarray(out.directions)[:, 0]
        theta2 = np.arctan2(d_out[1], d_out[0])
        assert np.sin(theta2) == pytest.approx(np.sin(theta1) / 1.5)

    def test_exiting_restores_world_index(self):
        # ray inside glass (index 1.5) exiting through a plane whose normal
        # (+x after rotate_y(90)) points along the travel direction
        surface = XYPlane(material=materials.glass["ideal"]).rotate_y(90)
        rs = rayset_towards_x(n=2)
        rs = rs.replace(index=rs.index * 1.5)
        # direction +x exits: v . n > 0 with plane normal +x
        out = materials.glass["ideal"].trace(surface, rs)
        assert np.allclose(np.asarray(out.index), 1.0)

    def test_tir_keeps_index(self):
        surface = XYPlane(material=materials.glass["ideal"]).rotate_y(90)
        rs = RaySet.create(1)
        rs = rs.replace(index=rs.index * 1.5)
        theta1 = np.deg2rad(60)  # beyond critical angle (~41.8 deg)
        d = np.array([np.cos(theta1), np.sin(theta1), 0.0, 0.0])
        rs = rs.replace(directions=rs.directions.at[:, 0].set(d))
        out = materials.glass["ideal"].trace(surface, rs)
        assert float(np.asarray(out.index)[0]) == pytest.approx(1.5)
        d_out = np.asarray(out.directions)[:, 0]
        assert d_out[0] == pytest.approx(-np.cos(theta1))  # reflected
        assert d_out[1] == pytest.approx(np.sin(theta1))


class TestDispersionModels:
    def test_basic_refractor_scalar_and_array(self):
        glass = materials.BasicRefractor(1.7)
        assert float(glass.index_at(0.5)) == pytest.approx(1.7)
        arr = np.asarray(glass.index_at(np.linspace(0.4, 0.7, 5)))
        assert arr.shape == (5,) and np.allclose(arr, 1.7)

    def test_sellmeier_analytic(self):
        # n(l) = sqrt(1 + b1 l^2/(l^2 - c1)); with b1=1, c1=-l^2 ->
        # n = sqrt(1 + 1/2) at l^2 = c1 magnitude... use the reference's
        # closed form: b1=4/3, c1 chosen so l^2/(l^2-c1) = 1 at large l
        glass = materials.SellmeierRefractor(b1=4 / 3)
        # c1 = 0 -> n = sqrt(1 + 4/3) = sqrt(7/3) for every wavelength
        assert float(glass.index_at(0.5)) == pytest.approx(np.sqrt(7 / 3))
        arr = np.asarray(glass.index_at(np.linspace(0.4, 0.7, 7)))
        assert np.allclose(arr, np.sqrt(7 / 3))

    def test_bk7_literature_values(self):
        bk7 = materials.glass["BK7"]
        assert float(bk7.index_at(0.5876)) == pytest.approx(1.5168, abs=1e-4)
        assert float(bk7.index_at(0.4861)) == pytest.approx(1.5224, abs=1e-4)

    def test_abbe_number(self):
        assert materials.glass["BK7"].abbe() == pytest.approx(64.17, abs=0.1)

    def test_packed_coeffs_match_index_at(self):
        for name in ("ideal", "BK7", "SF5", "SF2"):
            glass = materials.glass[name]
            wl = np.linspace(0.4, 0.7, 9)
            packed = np.asarray(
                materials.index_from_coeffs(glass.glass_coeffs(), wl)
            )
            direct = np.asarray(glass.index_at(wl))
            assert np.allclose(packed, direct, atol=1e-12), name


class TestDispersionThroughTrace:
    def test_sellmeier_full_trace(self):
        # sqrt(7/3) glass slab; trace and check recorded index bookkeeping
        glass = materials.SellmeierRefractor(b1=4 / 3)
        lens = components.thick_lens(np.inf, np.inf, 0.25, material=glass, aperture=4)
        bf = components.baffle((4, 4)).move_x(2)
        source = components.LineOfRays(spacing=1).move_x(-1)
        tracer = pyrayt.RayTracer(source, [lens, bf], rays_per_source=5)
        frame = tracer.trace()
        # generation 1 rays are inside the glass
        gen1 = frame[frame["generation"] == 1]
        assert np.allclose(gen1["index"], np.sqrt(7 / 3), atol=1e-6)
        # generation 2 rays have exited back to world index
        gen2 = frame[frame["generation"] == 2]
        assert np.allclose(gen2["index"], 1.0, atol=1e-6)

    def test_prism_disperses_wavelengths(self):
        # rays crossing the prism's sloped faces deflect in the XZ plane;
        # BK7 refracts blue more strongly than red
        prism = components.equilateral_prism(1, 1)
        z0 = 0.1
        source_red = components.LineOfRays(0.0, wavelength=0.65).move_x(-2).move_z(z0)
        source_blue = components.LineOfRays(0.0, wavelength=0.45).move_x(-2).move_z(z0)
        bf = components.baffle((10, 10)).move_x(3)
        tracer = pyrayt.RayTracer(
            [source_red, source_blue], [prism, bf], rays_per_source=1
        )
        frame = tracer.trace()
        final = frame[frame["surface"] == float(bf.get_id())]
        assert len(final) == 2
        red_z = float(final[np.isclose(final["wavelength"], 0.65)]["z1"].iloc[0])
        blue_z = float(final[np.isclose(final["wavelength"], 0.45)]["z1"].iloc[0])
        assert red_z != blue_z
        # both deflected off the straight-through line, blue further
        assert abs(blue_z - z0) > abs(red_z - z0) > 0.01


class TestMaterialImmutability:
    """Materials hash by dispersion value (_ValueIdentity) and key compile
    caches and compile_scene's slot map, so the values must be frozen after
    construction (advisor round 2)."""

    def test_sellmeier_coeffs_read_only(self):
        g = materials.SellmeierRefractor(b1=4 / 3)
        assert g.b1 == 4 / 3
        with pytest.raises(AttributeError):
            g.b1 = 2.0
        with pytest.raises(AttributeError):
            g.c3 = 1.0

    def test_basic_refractor_read_only(self):
        g = materials.BasicRefractor(1.5)
        assert g.refractive_index == 1.5
        with pytest.raises(AttributeError):
            g.refractive_index = 1.6

    def test_hash_stable_and_value_equal(self):
        a = materials.SellmeierRefractor(b1=1.0, c1=0.01)
        b = materials.SellmeierRefractor(b1=1.0, c1=0.01)
        assert a == b and hash(a) == hash(b)
        c = materials.SellmeierRefractor(b1=2.0, c1=0.01)
        assert a != c
