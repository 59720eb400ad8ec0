from .manifest import (  # noqa: F401
    BucketManifest,
    atomic_write_bytes,
    atomic_write_table,
    load_manifest,
    load_all_manifests,
    write_manifest,
)
