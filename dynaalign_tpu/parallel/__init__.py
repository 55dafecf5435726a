from .mesh import (  # noqa: F401
    block_sharded,
    distributed_init,
    make_mesh,
    replicated,
    row_sharded,
)
from .allpairs import (  # noqa: F401
    sharded_minhash_similarity,
    sharded_nw_allpairs,
    sharded_nw_allpairs_bucketed,
    sharded_signature_agreement,
)
