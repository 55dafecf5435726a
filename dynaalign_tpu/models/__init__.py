from . import reference_r  # noqa: F401
from .reference_r import (  # noqa: F401
    apply_hash,
    compute_distance_matrix,
    compute_signature_matrix,
    create_char_matrix,
    create_hash_parameters,
    create_vocab,
    minhash,
    shingle,
)
