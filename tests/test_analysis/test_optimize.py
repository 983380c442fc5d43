"""End-to-end differentiable lens optimization (analysis/optimize.py).

Counterpart of the reference notebook's scipy.optimize doublet loop
(lens_design.ipynb cells 28-33), run with analytic gradients: the loss must
fall substantially and the optimized geometry must beat the start.
"""

import jax.numpy as jnp
import numpy as np

from pyrayt_tpu import components as comp
from pyrayt_tpu import materials as matl
from pyrayt_tpu.analysis import metrics
from pyrayt_tpu.analysis.optimize import build_objective, optimize
from pyrayt_tpu.config import TraceConfig


def test_singlet_focus_optimization_converges():
    """Tune a biconvex singlet's curvatures so a collimated beam focuses on
    a detector at x=2: RMS spot radius must drop by >5x from a detuned
    start."""
    config = TraceConfig(generation_limit=4, fixed_loop=True)
    source = comp.LineOfRays(0.4).move_x(-1.0)
    rays = source.generate_rays(16)

    def build(theta):
        lens = comp.thick_lens(
            r1=theta["r1"],
            r2=-theta["r1"],
            thickness=0.1,
            aperture=0.8,
            material=matl.glass["ideal"],
            r1_sign=1,
            r2_sign=-1,
        )
        det = comp.baffle((3.0, 3.0)).move_x(2.0)
        return [lens, det]

    objective = build_objective(build, rays, metrics.rms_spot_radius, config)

    # detuned start: r = 3.0 focuses way beyond the detector
    theta0 = {"r1": jnp.asarray(3.0)}
    loss0 = float(objective(theta0))
    theta_opt, history = optimize(
        objective, theta0, steps=60, learning_rate=5e-2
    )
    loss_opt = float(objective(theta_opt))

    assert loss_opt < loss0 / 5, (loss0, loss_opt)
    assert history[-1] < history[0]
    # the paraxial optimum for f=2, n=1.5 symmetric biconvex is r ~ 2(n-1)f = 2
    assert 1.5 < float(theta_opt["r1"]) < 2.5


def test_optimize_accepts_custom_optimizer():
    import optax

    objective = lambda theta: (theta - 3.0) ** 2  # noqa: E731
    theta, history = optimize(
        objective, jnp.asarray(0.0), steps=200,
        optimizer=optax.sgd(1e-1),
    )
    assert np.allclose(float(theta), 3.0, atol=1e-3)
    assert history[-1] < 1e-6
