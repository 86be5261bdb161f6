from .sharded_index import ShardedFlatIndex, ShardedPQIndex
from .mesh import (
    SHARD_AXIS,
    make_mesh,
    replicate,
    shard_codes,
    shard_mask,
    shard_rows,
    sharded_adc_topk,
    sharded_lloyd_step,
    sharded_scan_topk,
)

__all__ = [
    'ShardedFlatIndex',
    'ShardedPQIndex',
    'SHARD_AXIS',
    'make_mesh',
    'replicate',
    'shard_codes',
    'shard_mask',
    'shard_rows',
    'sharded_adc_topk',
    'sharded_lloyd_step',
    'sharded_scan_topk',
]
