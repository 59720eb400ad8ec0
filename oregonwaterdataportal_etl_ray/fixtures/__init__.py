from .events import generate_change_events, GeneratorSpec  # noqa: F401
