"""Trace engine, ray storage, and the user-facing RayTracer."""

from pyrayt_tpu.tracer.rayset import RaySet, concatenate
from pyrayt_tpu.tracer.engine import TraceResult, build_trace_fn, trace_rays
from pyrayt_tpu.tracer.frame import FRAME_COLUMNS, records_to_dataframe
from pyrayt_tpu.tracer.tracer import RayTracer, pin
