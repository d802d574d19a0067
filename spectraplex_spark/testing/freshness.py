"""Machine-checked graded-window freshness ledger (r9 verdict task #2).

The external driver grades the FIRST ``WINDOW_SIZE`` entries of the query
catalog each round and records per-query verdicts in
``CORRECTNESS_r{NN}.json`` at the repo root.  The judge reconstructs, per
catalog entry, the latest round with a green driver verdict and flags any
entry whose latest green is older than ``FRESHNESS_BAR`` rounds — unless a
named deferral justifies it through a fresher in-family sibling.

Until round 9 that composition logic lived in a hand-maintained comment in
``plans/__init__.py`` and was re-derived by hand each round; one typo could
silently un-grade an operator.  This module is the executable version: it
parses every CORRECTNESS file, computes per-entry latest-green, and checks
the window's legality.  ``tests/test_freshness.py`` wires it as a pytest so
the window composition is a green test, not a comment.

Green means: ``hash_match is True`` (full value parity vs the DuckDB
oracle), or the driver's weaker rows-only record (``err == 'no_oracle'``)
for the two entries proven non-oracle-able, each certified through hashed
planted twins (``ROWS_ONLY_PROVEN``).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

# --- round-14 composition constants ---------------------------------------

#: The round the CURRENT window (plans/__init__.py `_GRADED_PRIORITY`) is
#: composed for.  Bump together with the window rewrite each round.
CURRENT_ROUND = 14

#: The driver grades exactly this many catalog entries per round.
WINDOW_SIZE = 50

#: Max allowed age, in rounds, of an entry's latest green verdict after the
#: current round's grading (the judge's bar: at round N nothing may be
#: older than round N-3 without a named deferral).
FRESHNESS_BAR = 3

#: Entries whose regrade is DEFERRED past the bar this round, each justified
#: by an in-family sibling exercising the same code path with a green
#: verdict inside the bar (and pytest parity coverage, which the full suite
#: re-certifies every round).  value = (sibling, why).
DEFERRALS: dict[str, tuple[str, str]] = {
    # Round 14: EMPTY — third zero-deferral window in a row.  Freshness
    # projected 45 mandatory for 50 slots (the curation_run_e2e late
    # registration + 44 aging r10-vintage entries); the 5 slack slots
    # went to early regrades of r11-vintage entries (flagship golden,
    # serving core, and three demotion siblings — see the rationale in
    # plans/__init__.py), smoothing the r15 aging load from 49 to 44.
}

#: Entries registered AFTER the current round's window sealed; they grade
#: next round per the standing late-registration precedent (since r7).
#: Populated as round-14 work registers new queries.
LATE_REGISTRATIONS: set[str] = set()

# ---- ROUND-15 PRE-PLAN (run `python -m spectraplex_spark.testing.freshness`
# for the live numbers; written at r14 composition, re-check at close):
#   Assuming the r14 window greens, r15 mandatory = the 44 remaining
#   r11-vintage entries (49 minus the five early regrades
#   solana_normalize_golden / events_by_user / knn_join_topk /
#   session_stats / simsearch_ivf_topk) + any r14 late registrations;
#   register more only with matching demotion or deferral capacity
#   (see the graded-entry-capacity memory — keep r15 mandatory ≤ 48,
#   the r13 verdict's task #4 bar).  simhash_planted_twins regraded
#   r13, so the two ROWS_ONLY_PROVEN simhash entries are carried
#   through r16.
# ---------------------------------------------------------------------------

#: Proven non-SQL-expressible entries the driver can only rows-only check.
#: Each is certified through hashed planted twins; value = the twin whose
#: hash verdict carries the family's freshness.
ROWS_ONLY_PROVEN: dict[str, str] = {
    "simhash_dup_groups": "simhash_planted_twins",
    "simhash_neighbor_pairs": "simhash_planted_twins",
}

#: Entries whose underlying code changed this round, so their prior hash no
#: longer certifies HEAD — each MUST sit in the current window.
CHANGED_CODE_REGRADES: set[str] = {
    # Round 14: none.  The r13 set (corpus_pack_assignment schema
    # regrade + the five review-pass byte-identity certifications) was
    # discharged by the 50/50-green CORRECTNESS_r13.json; the full audit
    # trail lives in git history at the r13 tag of this file.
    # Changed-code fixes this round, certified through the standing
    # non-semantic precedent (rpc_ingest r11) with the r13 snapshot
    # proof pattern — pre-change oracle+Spark outputs captured at BOTH
    # SFs, diffed byte-identical after (12/12: dsir_importance_sample,
    # pagerank_conserving_ranks, training_shuffle_shards,
    # cohort_retention_daily, semantic_decontam_report,
    # funnel_conversion_report × 2 SFs):
    #   - serving/ingest-edge review pass (connector retry containment,
    #     Retry-After date form, datasource default throttle, HTTP-edge
    #     error mapping, init-tables layout): transport/CLI seams; the
    #     graded rpc_ingest_datasource regrades in-window this round.
    #   - dsir: shared _importance_score helper + single-evaluation
    #     score (struct accumulator; token-free docs NULL out instead
    #     of a second size(toks) pass), NULL-safe fallback, typed
    #     threshold frame.  Survivors identical (pytest-pinned twins);
    #     curation_run_e2e regrades in-window.
    #   - shuffling: _finish rank arithmetic int32→BIGINT (overflow at
    #     total·n_shards > 2^31); values identical at every graded SF.
    #   - graph: loop-invariant ed/deg/nodes/edeg truncated pre-loop
    #     (plan-only; trajectory bit-identical); pagerank_ranks
    #     regrades in-window.
    #   - analytics: cohort_retention NULL-ts prefilter (no fixture has
    #     NULL ts — scanned both SFs).
    #   - decontam: DECIMAL-from-first-multiply accumulators (closes
    #     the non-ANSI long-wrap fail-open), descriptive NULL-eval
    #     validation, lineage_truncate helper adoption.
    #     decontam_ngram_overlap + fuzzy_decontam_planted + the
    #     curation composition regrade in-window this round.
    #   - multimodal/webdataset/incremental/estimators/components pass:
    #     NULL-payload propagation (meta/feature nullability relaxed —
    #     10/10 snapshot byte-identity on the multimodal/webdataset
    #     graded family at both SFs incl. out-of-window
    #     multimodal_binary_meta), webdataset stale-shard clear +
    #     up-front key probe, rollup behind-pointer refusal, exact
    #     max_iter=1 convergence check + try/finally cache ownership in
    #     connected_components, estimator shingle combine unified into
    #     dedup.shingle_hashes_from (expression-identical by
    #     construction; minhash/dedup/corpus_prep parity re-ran green).
    #   - catalog-infrastructure pass: _drain (loud stream timeouts),
    #     _replay_scratch (bounded /tmp), deterministic_id NULL
    #     poisoning (non-NULL ids byte-identical — hashlib pin +
    #     closed-form oracle), registry.table conf restore,
    #     normalize_throughput count tied to count(events) (identical
    #     at every shipped SF, proven by the closed-form oracle parity),
    #     shared DEC/dec6, unpivot dead-projection removal.  26-entry
    #     parity sample green; the round-close dual-SF sweep
    #     re-certifies the full surface.
    #   - streaming-operator pass: the watermarked-funnel sealing bug
    #     (NoTimeout never engaged Spark's late-row drop — verified in
    #     the 4.1.2 exec bytecode; now EventTimeTimeout + an in-fn
    #     re-drop, with the drop test made discriminating and proven
    #     red on the old code), funnel key typing derived from the
    #     input column, block-continuity redelivery dedup +
    #     deterministic fork ordering, slot_filter try_cast (ANSI
    #     poison pill), neardup banded frame narrowed to 3 columns
    #     (×bands _h replication removed).  12/12 snapshot
    #     byte-identity across the streaming graded family at both SFs
    #     (fixtures replay in-order, so the sealed-path fix is
    #     invisible to them); 20-entry streaming parity green.
}


# --- history parsing --------------------------------------------------------

def load_history(repo_root: str | Path) -> dict[str, list[tuple[int, dict]]]:
    """Parse every CORRECTNESS_r*.json into {entry: [(round, record), ...]}."""
    hist: dict[str, list[tuple[int, dict]]] = {}
    for f in sorted(Path(repo_root).glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, rec in json.loads(f.read_text()).items():
            hist.setdefault(name, []).append((rnd, rec))
    return hist


def _is_green(rec: dict) -> bool:
    if rec.get("hash_match") is True:
        return True
    # The driver's weaker rows-only record for oracle-less entries.
    return rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None


def latest_green(hist: dict[str, list[tuple[int, dict]]]) -> dict[str, int]:
    """Per entry, the newest round with a green driver verdict."""
    out: dict[str, int] = {}
    for name, recs in hist.items():
        greens = [rnd for rnd, rec in recs if _is_green(rec)]
        if greens:
            out[name] = max(greens)
    return out


# --- the legality check -----------------------------------------------------

def check_window(
    catalog_names: list[str],
    hist: dict[str, list[tuple[int, dict]]] | None = None,
    repo_root: str | Path = Path(__file__).resolve().parents[2],
) -> list[str]:
    """Return a list of legality problems (empty == the window is legal).

    Rules (the judge's reconstruction, made executable):
      1. catalog must hold at least WINDOW_SIZE entries; the window is the
         first WINDOW_SIZE, which must be unique names (they are dict keys,
         so uniqueness is structural — we assert size instead).
      2. every never-graded entry is in the window or declared late.
      3. post-grading, no out-of-window entry's latest green is older than
         CURRENT_ROUND - FRESHNESS_BAR, unless it carries a named deferral
         whose sibling is fresh (in-window now, or green within the bar),
         or it is a proven rows-only entry whose planted twin is fresh.
      4. every changed-code regrade is in the window.
      5. config hygiene: deferral/late/rows-only names must exist in the
         catalog; deferrals must actually be stale (else the config rotted).
    """
    problems: list[str] = []
    if hist is None:
        hist = load_history(repo_root)
    fresh_floor = CURRENT_ROUND - FRESHNESS_BAR

    if len(catalog_names) < WINDOW_SIZE:
        return [f"catalog has {len(catalog_names)} entries < window {WINDOW_SIZE}"]
    window = set(catalog_names[:WINDOW_SIZE])
    green = latest_green(hist)

    def sibling_fresh(sib: str) -> bool:
        return sib in window or green.get(sib, -(10 ** 9)) >= fresh_floor

    # rule 5: config hygiene
    cat = set(catalog_names)
    for name in [*DEFERRALS, *LATE_REGISTRATIONS, *ROWS_ONLY_PROVEN,
                 *(sib for sib, _ in DEFERRALS.values()),
                 *ROWS_ONLY_PROVEN.values(), *CHANGED_CODE_REGRADES]:
        if name not in cat:
            problems.append(f"config names unknown catalog entry: {name}")
    for name in DEFERRALS:
        if name in window:
            problems.append(f"deferral {name} is in-window — stale DEFERRALS config")
        elif green.get(name, -(10 ** 9)) >= fresh_floor:
            problems.append(f"deferral {name} is already fresh — stale DEFERRALS config")
    for name in LATE_REGISTRATIONS:
        if name in hist:
            problems.append(f"late registration {name} already has a driver record")
        if name in window:
            problems.append(f"late registration {name} is in-window — it grades next round")

    # rule 2: never-graded entries must be graded now or declared late
    for name in catalog_names:
        if name not in hist and name not in window and name not in LATE_REGISTRATIONS:
            problems.append(f"never-graded entry {name} is neither in-window nor declared late")

    # rule 3: freshness bar for everything outside the window
    for name in catalog_names:
        if name in window or name in LATE_REGISTRATIONS or name not in hist:
            continue
        if green.get(name, -(10 ** 9)) >= fresh_floor:
            continue
        if name in DEFERRALS and sibling_fresh(DEFERRALS[name][0]):
            continue
        if name in ROWS_ONLY_PROVEN and sibling_fresh(ROWS_ONLY_PROVEN[name]):
            continue
        problems.append(
            f"{name}: latest green r{green.get(name, '—')} < bar r{fresh_floor}, "
            "no fresh deferral sibling"
        )

    # rule 4: changed-code regrades sit in the window
    for name in CHANGED_CODE_REGRADES:
        if name in cat and name not in window:
            problems.append(f"changed-code entry {name} is not in the graded window")

    return problems


def split_histogram(
    green: dict[str, int],
) -> tuple[dict[int, int], dict[str, str]]:
    """Vintage histogram with the ROWS_ONLY_PROVEN entries split out.

    Returns (hashed-green histogram {round: count}, rows-only label map
    {entry: "r<latest> via twin <twin> r<twin latest>"}).  The rows-only
    entries' own records are old by design (their twin carries the
    freshness), so counting them in the main histogram reads like a
    stale-green alarm.
    """
    from collections import Counter

    hashed = dict(
        Counter(sorted(g for n, g in green.items() if n not in ROWS_ONLY_PROVEN))
    )
    rows_only = {
        n: f"r{green[n]} via twin {twin} r{green.get(twin, '—')}"
        for n, twin in sorted(ROWS_ONLY_PROVEN.items())
        if n in green
    }
    return hashed, rows_only


def main() -> None:  # pragma: no cover - CLI convenience
    from spectraplex_spark.plans import CATALOG

    problems = check_window(list(CATALOG))
    if problems:
        for p in problems:
            print("PROBLEM:", p)
        raise SystemExit(1)
    hist = load_history(Path(__file__).resolve().parents[2])
    names = list(CATALOG)
    # Restrict to live catalog entries: demoted (PARITY_ONLY) names keep
    # their old driver records in history, but they are off the graded
    # surface — counting them would read as a permanent stale-green alarm.
    green = {n: g for n, g in latest_green(hist).items() if n in set(names)}
    print(f"window legal: {WINDOW_SIZE} graded of {len(names)} catalog entries, "
          f"round {CURRENT_ROUND}, bar r{CURRENT_ROUND - FRESHNESS_BAR}")
    # The proven rows-only entries carry their freshness through a hashed
    # planted twin, not their own (old) rows-only record — histogram them
    # separately so an old bucket can't misread as a stale-green alarm
    # (r10 verdict task #3).
    hashed, rows_only = split_histogram(green)
    print("vintage histogram (latest hashed green):", hashed)
    if rows_only:
        print("rows-only(proven) entries — freshness via planted twin:", rows_only)

    # ---- next-round planning (assumes the current window greens) ----
    nxt = CURRENT_ROUND + 1
    window = set(names[:WINDOW_SIZE])
    projected = {n: (CURRENT_ROUND if n in window else green.get(n)) for n in names}
    def rows_only_relieved(n: str) -> bool:
        twin = ROWS_ONLY_PROVEN.get(n)
        return twin is not None and (projected.get(twin) or -(10 ** 9)) >= nxt - FRESHNESS_BAR

    mandatory = sorted(
        n for n, g in projected.items()
        if ((g is None and n not in window) or (g is not None and g < nxt - FRESHNESS_BAR))
        and not rows_only_relieved(n)
    )
    print(
        f"\nround-{nxt} planning (assuming the r{CURRENT_ROUND} window greens):\n"
        f"  mandatory regrades: {len(mandatory)} for {WINDOW_SIZE} slots\n"
        f"  = {len(LATE_REGISTRATIONS)} late registrations "
        f"+ {len(mandatory) - len(LATE_REGISTRATIONS)} aging entries"
    )
    over = len(mandatory) - WINDOW_SIZE
    if over > 0:
        print(f"  OVERSUBSCRIBED by {over}: name ≥{over} deferrals with fresh "
              "in-family siblings when composing the window")
    for n in mandatory:
        tag = "never-graded(late)" if projected[n] is None else f"latest r{projected[n]}"
        print(f"    {n}  [{tag}]")


if __name__ == "__main__":  # pragma: no cover
    main()
