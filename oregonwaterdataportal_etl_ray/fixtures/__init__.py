from .events import (GeneratorSpec, generate_change_events,  # noqa: F401
                     generate_patch_events)
