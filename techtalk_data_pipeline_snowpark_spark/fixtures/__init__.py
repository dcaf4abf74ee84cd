from .generators import (
    change_events,
    change_events_evolution,
    orders,
    payments,
    ratings,
    restaurants,
    source_files,
)

__all__ = [
    "change_events",
    "change_events_evolution",
    "orders",
    "payments",
    "ratings",
    "restaurants",
    "source_files",
]
