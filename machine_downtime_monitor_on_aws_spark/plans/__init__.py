"""Query catalog: every driver-visible query with its DuckDB oracle."""

from . import catalog  # noqa: F401


def _load_all() -> None:
    # import for registration side effects
    from . import domain, relational, textops, vectorops  # noqa: F401


_load_all()
