from .engine import CdcEngine, ReplayResult  # noqa: F401
from .oracle import oracle_replay  # noqa: F401
from .schema import EvolutionSpec, plan_target_schema  # noqa: F401
from .patch import fold_patch_runs, oracle_patch_replay  # noqa: F401
