"""Bronze → Silver normalization (the reference's flagship operator, U1).

Re-expresses ``parse_solana_transaction`` (reference
``adapters/src/solana_parser.rs:7-93``) as a pure DataFrame→DataFrame
transformation: ``from_json`` → select/explode/filter — fully
Catalyst-optimizable, no Python in the hot path, no shuffle (the whole
pipeline is narrow: per-row fan-out via ``explode``). At 100 TB this is a
single map-stage over the bronze scan; parallelism is simply bronze
partitioning, and the pre/post token-balance "join" (J1, SURVEY §2.3)
never leaves the row — it is an array higher-order-function lookup, not a
relational join, so it costs zero shuffle.

Semantics mirrored from the reference (file:line cited inline):
  - chain dispatch: only `solana` rows are normalized
    (cli/src/main.rs:153-161, api/src/main.rs:101-106).
  - missing `meta` → transaction skipped (solana_parser.rs:15-18).
  - native SOL delta: wallet's index in accountKeys →
    (postBalances[i] - preBalances[i]) / 1e9 (solana_parser.rs:26,89-93);
    wallet absent from accountKeys → no SOL entry (solana_parser.rs:26).
  - SPL delta: for each postTokenBalance owned by the wallet
    (owner == wallet, 3-way Option match: null owner ≠ match,
    solana_parser.rs:50-57), find preTokenBalance with equal accountIndex,
    missing → 0 ("new token account", solana_parser.rs:61-64);
    delta = post - pre ui amounts (solana_parser.rs:66-67).
  - dust filter: |delta| > 1e-6 on both branches (solana_parser.rs:29,69).
  - entry_type: the reference's degenerate sign dispatch (both branches
    `Transfer`, "Simplified for now", solana_parser.rs:37) — kept as an
    explicit when/otherwise hook.
  - fiat_value: never populated (solana_parser.rs:38,78) → null.

Deliberate divergences (documented in SURVEY §4.2):
  - deltas computed in DecimalType (exact), not f64.
  - deterministic content-hash ids instead of UUIDv4.
  - explicit error policy: unparseable raw_metadata rows are dropped from
    the silver output and surfaced via ``parse_failures`` (the reference
    CLI aborts on first parse error while the API silently swallows them —
    cli/src/main.rs:155 vs api/src/main.rs:103; we make it explicit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from spectraplex_spark.functions.ids import deterministic_id
from spectraplex_spark.functions.money import lamports_to_sol
from spectraplex_spark.schemas import MONEY, SOLANA_TX_SCHEMA

def _dust_threshold() -> Column:
    # |delta| must exceed this to be emitted (solana_parser.rs:29,69).
    return F.lit("0.000001").cast(MONEY)

def _entry_type(amount: Column) -> Column:
    # Reference F7: `if sol_change > 0.0 { Transfer } else { Transfer }`
    # (solana_parser.rs:37). Both branches transfer today; the hook stays
    # so in/out classification can land without a plan change.
    return F.when(amount > 0, F.lit("transfer")).otherwise(F.lit("transfer"))


def _token_amount_dec(tb: Column) -> Column:
    """Token balance struct → exact decimal amount.

    Prefers the raw integer string + decimals (exact scale shift; Spark's
    decimal division rules give DECIMAL(38,18) here) over the f64
    ``uiAmount`` the reference uses (solana_parser.rs:63-66) — falling
    back to uiAmount only when the raw fields are absent.
    """
    raw = tb["uiTokenAmount"]["amount"]
    dec = tb["uiTokenAmount"]["decimals"]
    ui = tb["uiTokenAmount"]["uiAmount"]
    exact = raw.cast(T.DecimalType(38, 18)) / F.pow(F.lit(10.0), dec).cast(
        T.DecimalType(20, 0)
    )
    return F.when(
        raw.isNotNull() & dec.isNotNull(), exact.cast(MONEY)
    ).otherwise(F.coalesce(ui, F.lit(0.0)).cast(MONEY))


def normalize(bronze: DataFrame, audit_ts: Column | None = None) -> DataFrame:
    """U1: bronze transactions → silver ledger entries (0..N per tx).

    Single-pass design: both the native-SOL delta and the SPL token
    deltas are built as an array of candidate entries per row, then
    exploded ONCE — the bronze scan happens exactly one time (the
    earlier union-of-branches form scanned it twice; at 100 TB the
    bronze scan IS the cost). Still zero shuffles and zero Python.

    ``audit_ts`` defaults to ``current_timestamp()`` (the reference's
    ``created_at TIMESTAMPTZ DEFAULT NOW()``, init.sql:31); tests pass a
    literal for determinism.
    """
    audit_ts = audit_ts if audit_ts is not None else F.current_timestamp()

    # from_json is PERMISSIVE: malformed JSON yields an all-null struct.
    # P6 null-meta guard: there is deliberately NO standalone
    # ``.filter(tx.meta.isNotNull())`` here — Catalyst pushes such a
    # filter below the from_json projection by alias substitution, which
    # re-parses the full JSON string a second time per row (observed in
    # the r14 plan: two from_json nodes, one in the pushed Filter, one
    # in the Project). The guard is structurally redundant for the
    # output: with ``tx.meta`` null BOTH candidate arrays below resolve
    # to the empty array (the SOL branch needs meta.pre/postBalances,
    # the SPL branch needs meta.pre/postTokenBalances), and
    # ``explode`` of an empty array emits nothing — so meta-less and
    # unparseable rows are skipped exactly as before (use
    # ``parse_failures`` to see them), at ONE parse per row instead of
    # two (r14 optimization round; output equality oracle-pinned).
    parsed = bronze.filter(F.col("chain") == "solana").withColumn(  # P7 dispatch
        "tx", F.from_json("raw_metadata", SOLANA_TX_SCHEMA)
    )

    # --- native SOL candidate (solana_parser.rs:20-45) ---
    # 1-based position of the wallet in accountKeys; 0 when absent.
    idx = F.array_position(
        F.transform(F.col("tx.transaction.message.accountKeys"), lambda k: k["pubkey"]),
        F.col("wallet_address"),
    )
    # get() is 0-based and null-on-OOB (no ANSI throw), so a wallet index
    # beyond a malformed balances array degrades to null → no entry.
    pre_bal = F.get(F.col("tx.meta.preBalances"), (idx - 1).cast("int"))
    post_bal = F.get(F.col("tx.meta.postBalances"), (idx - 1).cast("int"))
    sol_entry = F.struct(
        F.lit("SOL").alias("asset"),
        lamports_to_sol(post_bal - pre_bal).alias("amount"),
        # Entry provenance for id derivation: the SOL branch yields at most
        # one entry per tx, so a fixed sentinel distinct from every SPL
        # accountIndex (which are >= 0) suffices.
        F.lit(-1).cast("int").alias("ordinal"),
    )
    _EMPTY = "array<struct<asset:string,amount:decimal(38,18),ordinal:int>>"
    sol_candidates = F.when(
        (idx > 0) & pre_bal.isNotNull() & post_bal.isNotNull(),
        F.array(sol_entry),
    ).otherwise(F.array().cast(_EMPTY))

    # --- SPL token candidates (solana_parser.rs:47-86) ---
    # P4 ownership filter (3-way Option match, owner must be present) and
    # J1 pre/post equi-join as an in-row array lookup — zero shuffle.
    def spl_entry(tb):
        pre_tb = F.get(
            F.filter(
                F.col("tx.meta.preTokenBalances"),
                lambda p: p["accountIndex"] == tb["accountIndex"],
            ),
            0,
        )
        pre_amt = F.when(pre_tb.isNotNull(), _token_amount_dec(pre_tb)).otherwise(
            F.lit(0).cast(MONEY)  # missing pre → new token account = 0
        )
        return F.struct(
            tb["mint"].alias("asset"),
            (_token_amount_dec(tb) - pre_amt).cast(MONEY).alias("amount"),
            tb["accountIndex"].cast("int").alias("ordinal"),
        )

    # Reference nests two if-lets (solana_parser.rs:46-47): BOTH
    # preTokenBalances AND postTokenBalances must be present before ANY
    # SPL entry is emitted; a tx with post but null pre yields nothing
    # (per-entry "missing pre → 0" applies only WITHIN a present array).
    spl_candidates = F.when(
        F.col("tx.meta.preTokenBalances").isNotNull()
        & F.col("tx.meta.postTokenBalances").isNotNull(),
        F.transform(
            F.filter(
                F.col("tx.meta.postTokenBalances"),
                lambda tb: tb["owner"].isNotNull()
                & (tb["owner"] == F.col("wallet_address")),
            ),
            spl_entry,
        ),
    ).otherwise(F.array().cast(_EMPTY))

    exploded = parsed.select(
        "*", F.explode(F.concat(sol_candidates, spl_candidates)).alias("_e")
    ).filter(F.abs(F.col("_e.amount")) > _dust_threshold())  # P5 dust

    amount = F.col("_e.amount")
    return exploded.select(
        # The ordinal (SPL accountIndex, or -1 for the SOL branch) is part
        # of the id: without it, a wallet owning TWO token accounts of the
        # same mint with identical deltas in one tx would mint colliding
        # ids and idempotent_append would silently drop a legitimate entry.
        # The reference keeps both (one UUID per post-token-balance,
        # solana_parser.rs:47-87).
        deterministic_id(
            "tx_hash",
            "wallet_address",
            F.col("_e.asset"),
            amount.cast("string"),
            F.col("_e.ordinal").cast("string"),
        ).alias("id"),
        F.col("id").alias("transaction_id"),
        "user_id",
        "wallet_address",
        F.col("_e.asset").alias("asset_symbol"),
        amount.alias("amount"),
        _entry_type(amount).alias("entry_type"),
        F.lit(None).cast(MONEY).alias("fiat_value"),
        audit_ts.alias("created_at"),
    )


def parse_failures(bronze: DataFrame) -> DataFrame:
    """Bronze rows whose raw_metadata fails to parse (explicit error
    surface replacing the reference's fail-vs-swallow divergence,
    cli/src/main.rs:155 vs api/src/main.rs:103).

    Also surfaces CORRUPT-LINE rows: a JSONL line that fails the
    PERMISSIVE bronze read becomes an all-null row (Spark does not
    enforce read-schema nullability), which the solana-only predicate
    used to skip — exactly the silently-swallowed outcome this surface
    exists to prevent (review finding). All-null means no id, no hash,
    no payload: the row is detected by its three identity/payload
    columns all being null together."""
    bad_json = (
        (F.col("chain") == "solana")
        & F.col("raw_metadata").isNotNull()
        & F.try_parse_json("raw_metadata").isNull()
    )
    corrupt_line = (
        F.col("id").isNull()
        & F.col("tx_hash").isNull()
        & F.col("raw_metadata").isNull()
    )
    return bronze.filter(bad_json | corrupt_line)


# --------------------------------------------------------------------------
# Multi-chain dispatch (reference Chain enum: solana | hyperliquid |
# ethereum, core/src/models.rs:5-10; non-Solana inputs are skipped with a
# message — cli/src/main.rs:157-160 "Chain not supported", api/src/main.rs:105)
# --------------------------------------------------------------------------

# Registry of per-chain normalizers: chain -> DataFrame -> silver DataFrame.
# Only solana has an implementation — exactly the reference's state — but
# the seam is the ChainIngestor trait's (models.rs:46-49) engine-side twin:
# adding a chain is one entry here, no plan changes elsewhere.
CHAIN_NORMALIZERS = {
    "solana": normalize,
}


def normalize_multi(bronze: DataFrame, audit_ts: Column | None = None) -> DataFrame:
    """Dispatch bronze rows to their chain's normalizer; chains without a
    registered normalizer contribute nothing (see ``unsupported_chains``
    for the explicit skip surface)."""
    parts = [
        fn(bronze.filter(F.col("chain") == chain), audit_ts)
        for chain, fn in CHAIN_NORMALIZERS.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def unsupported_chains(bronze: DataFrame) -> DataFrame:
    """Counts of bronze rows whose chain has no normalizer — the engine's
    explicit version of the reference's skip-with-message behavior."""
    supported = list(CHAIN_NORMALIZERS)
    return (
        bronze.filter(~F.col("chain").isin(supported))
        .groupBy("chain")
        .agg(F.count(F.lit(1)).alias("n_skipped"))
    )
