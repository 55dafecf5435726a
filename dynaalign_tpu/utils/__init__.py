from .mt19937 import MT19937, hash_family_seeds  # noqa: F401
from .logging import get_logger, log_message  # noqa: F401
from .compile_cache import enable_persistent_cache  # noqa: F401
