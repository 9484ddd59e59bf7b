"""Query catalog: every driver-visible query with its DuckDB oracle."""

from . import catalog  # noqa: F401


def _load_all() -> None:
    # import for registration side effects
    from . import (  # noqa: F401
        domain,
        multimodalops,
        pipelineops,
        relational,
        relational2,
        textops,
        vectorops,
    )


_load_all()
