from .murmur3 import murmur3_kmer_hashes  # noqa: F401
from .minhash import (  # noqa: F401
    minhash_signatures,
    signature_similarity,
)
from .nw import nw_similarity_batch  # noqa: F401
