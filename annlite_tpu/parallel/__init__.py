from .sharded_index import ShardedPQIndex
from .mesh import (
    SHARD_AXIS,
    make_mesh,
    replicate,
    shard_codes,
    shard_mask,
    sharded_adc_topk,
    sharded_lloyd_step,
)

__all__ = [
    'ShardedPQIndex',
    'SHARD_AXIS',
    'make_mesh',
    'replicate',
    'shard_codes',
    'shard_mask',
    'sharded_adc_topk',
    'sharded_lloyd_step',
]
