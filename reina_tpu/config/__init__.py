"""Configuration: variables store, intervention schema, scenarios, metrics."""

from .variables import (  # noqa: F401
    VARIABLE_DEFAULTS,
    VariableStore,
    allow_set_variable,
    copy_variables,
    get_variable,
    reset_variable,
    reset_variables,
    session_store,
    set_variable,
)
