"""Query catalog: every driver-visible query with its DuckDB oracle."""

from . import catalog  # noqa: F401


def _load_all() -> None:
    # import for registration side effects
    from . import domain, relational, relational2, textops, vectorops  # noqa: F401


_load_all()
