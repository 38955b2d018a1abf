"""Batch / device-mesh parallelism: file-level DP over chips + batched
metering kernels (the TPU equivalents of the reference's worker pool,
SURVEY.md §2.3)."""

from .batch import (
    batched_integrated_loudness,
    batched_master,
    make_mesh,
    pad_to_batch,
    process_back_catalogue,
    process_files_data_parallel,
)
from .master import (
    sharded_master_stage_a,
    sharded_master_stage_b,
    sharded_resample,
)
from .sequence import (
    sharded_fir,
    sharded_gated_loudness,
    sharded_linear_recurrence,
    sharded_maxplus_prefix,
)

__all__ = [
    "batched_integrated_loudness",
    "batched_master",
    "make_mesh",
    "pad_to_batch",
    "process_back_catalogue",
    "process_files_data_parallel",
    "sharded_master_stage_a",
    "sharded_master_stage_b",
    "sharded_resample",
    "sharded_fir",
    "sharded_gated_loudness",
    "sharded_linear_recurrence",
    "sharded_maxplus_prefix",
]
