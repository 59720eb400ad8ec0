from .kernels import (  # noqa: F401
    md5_hex,
    sha256_hex,
    deterministic_id,
    iso_utc,
)
