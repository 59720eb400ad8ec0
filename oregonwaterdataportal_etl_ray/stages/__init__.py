from .kernels import keep_last_by, keep_first_by  # noqa: F401
from .joins import BroadcastLookup, broadcast_key_set  # noqa: F401
