"""Distribution: device mesh, shardings, multi-host init.

The reference is single-device/single-process (SURVEY.md §3 parallelism
table: no DP/TP/PP, no comm backend).  Here distribution is first-class and
entirely GSPMD: application code touches only Mesh + NamedSharding +
PartitionSpec; XLA inserts psum/all-gather over ICI/DCN.  No NCCL/MPI
analogue exists or is needed.
"""

from .mesh import make_mesh, data_sharding, replicated, shard_params_by_rules

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_params_by_rules"]
