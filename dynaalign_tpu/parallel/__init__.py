from .mesh import (  # noqa: F401
    block_sharded,
    distributed_init,
    make_mesh,
    replicated,
    row_sharded,
)
from .allpairs import (  # noqa: F401
    bucketed_schedule_stats,
    nw_allpairs_schedule_stats,
    plan_bucket_group,
    plan_nw_allpairs,
    sharded_minhash_similarity,
    sharded_minhash_topk,
    sharded_nw_allpairs,
    sharded_nw_allpairs_bucketed,
    sharded_signature_agreement,
)
