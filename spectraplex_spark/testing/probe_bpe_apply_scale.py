"""Realistic-merge-count probe for the BPE ENCODE path (the r9 verdict's
task #3 — the 10x-probe discipline applied to apply_bpe).

apply_bpe replays each merge as one higher-order fold nested into a
SINGLE Catalyst expression, so the expression tree is n_merges deep.
The r9 trainer probe caught exactly this plan-growth class on the train
side (fix: eager checkpoint per iteration); the encode side cannot be
checkpointed away — the expression IS the operator — so past some merge
count the cost must move off Catalyst entirely. This probe measures
where, and certifies the escape hatch:

  - merges: 1000 learned by an independent pure-Python Sennrich trainer
    over a 12k-distinct-word Zipf vocab (seconds, deterministic, and
    REAL merges — multi-char symbols chain like an actual tokenizer's);
  - corpus: 4,000 docs x 40 Zipf-cycled words (160k tokens);
  - expression path (apply_bpe): timed at escalating merge counts,
    stopping once a run exceeds the blowup budget (120 s) — expected
    super-linear growth in ANALYSIS/codegen time;
  - pandas path (apply_bpe_pandas): timed at 10 / 100 / 1000 merges —
    expected flat-ish (broadcast tokenizer + per-batch word cache;
    tests/test_bpe.py pins it bit-equal to the fold).

Run:  PYTHONPATH=/root/repo python -m spectraplex_spark.testing.probe_bpe_apply_scale
"""

from __future__ import annotations

import json
import time
from collections import Counter


def make_words(n_words: int = 12_000) -> list[tuple[str, int]]:
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def word(i: int) -> str:
        x = (i * 2654435761) % (1 << 61)
        length = 4 + (i % 8)
        out = []
        for _ in range(length):
            out.append(alpha[x % 26])
            x //= 26
            x = (x * 1103515245 + 12345) % (1 << 61)
        return "".join(out)

    best: dict[str, int] = {}
    for i in range(n_words):
        w = word(i)
        f = max(1, 200_000 // (i + 1))
        best[w] = max(best.get(w, 0), f)
    return sorted(best.items())


def py_train(words: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str, int]]:
    vocab = {w: (list(w), f) for w, f in words}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for symbols, f in vocab.values():
            for i in range(len(symbols) - 1):
                pairs[(symbols[i], symbols[i + 1])] += f
        if not pairs:
            break
        (a, b), pf = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if pf < 2:
            break
        merges.append((a, b, pf))
        for w, (s, f) in vocab.items():
            out, carry = [], None
            for sym in s:
                if carry is None:
                    carry = sym
                elif carry == a and sym == b:
                    out.append(a + b)
                    carry = None
                else:
                    out.append(carry)
                    carry = sym
            if carry is not None:
                out.append(carry)
            vocab[w] = (out, f)
    return merges


def main() -> dict:
    import pyspark.sql.functions as F

    from spectraplex_spark.operators.bpe import apply_bpe, apply_bpe_pandas
    from spectraplex_spark.session import get_spark

    spark = get_spark("bpe_apply_probe")
    words = make_words()
    t0 = time.monotonic()
    merges = py_train(words, 1000)
    train_s = round(time.monotonic() - t0, 1)
    print(f"pure-python trainer: {len(merges)} merges in {train_s}s", flush=True)

    flat = [w for w, _ in words]
    docs = spark.createDataFrame(
        [
            (d, " ".join(flat[(d * 37 + j * j) % len(flat)] for j in range(40)))
            for d in range(4000)
        ],
        "doc_id long, text string",
    ).repartition(32)
    docs = docs.localCheckpoint(eager=True)  # isolate encode cost from setup

    def timed(df) -> tuple[float, int]:
        t = time.monotonic()
        n = int(df.select(F.sum(F.size("bpe_symbols"))).collect()[0][0])
        return round(time.monotonic() - t, 2), n

    out: dict = {"trainer_s": train_s, "n_merges_available": len(merges)}
    expr: dict[str, object] = {}
    for k in (10, 50, 100, 200, 400):
        try:
            secs, n = timed(apply_bpe(docs, merges[:k]))
        except Exception as e:  # the blowup IS the probe result
            msg = str(e).splitlines()[0][:160]
            expr[str(k)] = f"FAILED: {msg}"
            print(f"expression fold  n_merges={k:4d}  FAILED: {msg}", flush=True)
            break
        expr[str(k)] = secs
        print(f"expression fold  n_merges={k:4d}  {secs:8.2f}s  symbols={n}", flush=True)
        if secs > 120:
            print("expression path over blowup budget; stopping escalation", flush=True)
            break
    out["expression_fold_s"] = expr
    pand: dict[str, float] = {}
    for k in (10, 100, 1000):
        if k > len(merges):
            break
        secs, n = timed(apply_bpe_pandas(docs, merges[:k]))
        pand[str(k)] = secs
        print(f"pandas tokenizer n_merges={k:4d}  {secs:8.2f}s  symbols={n}", flush=True)
    out["pandas_tokenizer_s"] = pand
    print("BPE_APPLY_PROBE_RESULT " + json.dumps(out, sort_keys=True), flush=True)
    return out


if __name__ == "__main__":
    main()
