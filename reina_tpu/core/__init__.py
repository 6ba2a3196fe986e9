"""Core engine: compiled parameters, schedules, and the scanned day step."""

from . import constants  # noqa: F401
from .engine import CompiledRun, ExecutionInterrupted, build_run, run_days  # noqa: F401
from .params import DISEASE_PARAMS, create_disease_params  # noqa: F401
from .state import AgentState, DayCarry  # noqa: F401
from .step import EngineConfig  # noqa: F401
