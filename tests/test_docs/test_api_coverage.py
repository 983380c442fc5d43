"""docs/api.md coverage: every public (`__all__`) name is documented.

VERDICT r4 found COVERAGE.md's "every __all__ name" claim false (73
names missing).  This test makes the claim mechanical and permanent: a
name counts as documented when it appears as a whole word anywhere in
docs/api.md (incl. dotted ``module.name`` mentions and tables).
"""

import importlib
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parents[2]

MODULES = [
    "pyrayt_tpu",
    "pyrayt_tpu.components",
    "pyrayt_tpu.materials",
    "pyrayt_tpu.utils",
    "pyrayt_tpu.config",
    "pyrayt_tpu.debug",
    "pyrayt_tpu.analysis",
    "pyrayt_tpu.analysis.metrics",
    "pyrayt_tpu.analysis.optimize",
    "pyrayt_tpu.analysis.checkpoint",
    "pyrayt_tpu.analysis.aberrations",
    "pyrayt_tpu.analysis.gradcheck",
    "pyrayt_tpu.core.homogeneous",
    "pyrayt_tpu.core.operations",
    "pyrayt_tpu.core.primitives",
    "pyrayt_tpu.core.intervals",
    "pyrayt_tpu.core.csg",
    "pyrayt_tpu.scene.objects",
    "pyrayt_tpu.scene.surfaces",
    "pyrayt_tpu.scene.csg",
    "pyrayt_tpu.scene.compile",
    "pyrayt_tpu.tracer.tracer",
    "pyrayt_tpu.tracer.frame",
    "pyrayt_tpu.tracer.rayset",
    "pyrayt_tpu.tracer.engine",
    "pyrayt_tpu.ops.fused_trace",
    "pyrayt_tpu.ops.fused_grad",
    "pyrayt_tpu.ops.sortnet",
    "pyrayt_tpu.parallel.mesh",
    "pyrayt_tpu.parallel.trace",
    "pyrayt_tpu.parallel.surfaces",
    "pyrayt_tpu.parallel.distributed",
    "pyrayt_tpu.render.camera",
    "pyrayt_tpu.render.renderers",
    "pyrayt_tpu.render.gooch",
    "pyrayt_tpu.render.color",
]


def test_every_public_name_is_documented():
    doc = (REPO / "docs" / "api.md").read_text()
    missing = []
    for mname in MODULES:
        mod = importlib.import_module(mname)
        for name in getattr(mod, "__all__", []):
            if re.search(r"\b" + re.escape(name) + r"\b", doc) is None:
                missing.append(f"{mname}.{name}")
    assert not missing, (
        f"{len(missing)} public names missing from docs/api.md: {missing}"
    )
