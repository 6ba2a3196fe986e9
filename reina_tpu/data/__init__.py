"""Datasets: population structure, contact matrices, observed cases."""

from .loaders import (  # noqa: F401
    get_population_for_area,
    get_contact_tensor,
    get_detected_cases,
    get_initial_population_condition,
    InitialPopulationCondition,
)
