"""Batch perceptron training (operators/linear.py) vs an independent
pure-Python reference, plus the determinism and convergence contracts
the trajectory grading rides on."""

from __future__ import annotations

from spectraplex_spark.operators.linear import perceptron_trajectory


def py_perceptron(rows, k, epochs):
    """Independent reference: rows = [(y, x0..xk-1)]."""
    w = [0] * k
    out = []
    for e in range(1, epochs + 1):
        d = [0] * k
        nm = 0
        for y, *x in rows:
            if y * sum(w[j] * x[j] for j in range(k)) <= 0:
                nm += 1
                for j in range(k):
                    d[j] += y * x[j]
        w = [w[j] + d[j] for j in range(k)]
        out.append((e, nm, *w))
    return out


ROWS = [
    # planted linear rule y = sign(2*x1 - x2 + 1) with a bias feature x0=1
    (1, 1, 5, 4),
    (1, 1, 7, 2),
    (-1, 1, 1, 9),
    (-1, 1, 2, 8),
    (1, 1, 9, 1),
    (-1, 1, 0, 3),
    (1, 1, 6, 6),
    (-1, 1, 3, 9),
]


def _df(spark, rows):
    return spark.createDataFrame(
        [(y, x0, x1, x2) for y, x0, x1, x2 in rows],
        "y long, x0 long, x1 long, x2 long",
    )


def test_matches_pure_python_reference(spark):
    got = [
        tuple(r)
        for r in perceptron_trajectory(_df(spark, ROWS), ["x0", "x1", "x2"], "y", epochs=5)
        .orderBy("epoch")
        .collect()
    ]
    assert got == py_perceptron([(y, x0, x1, x2) for y, x0, x1, x2 in ROWS], 3, 5)


def test_trajectory_is_partition_order_independent(spark):
    """The batch update is a commutative SUM, so the trajectory must be
    bit-identical under any partitioning — the property that lets it
    hash-grade at all."""
    base = _df(spark, ROWS)
    a = perceptron_trajectory(base.repartition(1), ["x0", "x1", "x2"], "y", 4).collect()
    b = perceptron_trajectory(base.repartition(7, "x2"), ["x0", "x1", "x2"], "y", 4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_converges_on_separable_rule(spark):
    """On linearly separable data the misclassified count must reach 0
    within a reasonable epoch budget (perceptron convergence theorem) and
    stay there — later epochs are then pure no-op updates."""
    rows = [(1 if 3 * a - b > 0 else -1, 1, a, b) for a in range(8) for b in range(8) if 3 * a != b]
    traj = (
        perceptron_trajectory(_df(spark, rows), ["x0", "x1", "x2"], "y", epochs=12)
        .orderBy("epoch")
        .collect()
    )
    n_mis = [r["n_mis"] for r in traj]
    assert n_mis[-1] == 0
    i = n_mis.index(0)
    ws = [(r["w0"], r["w1"], r["w2"]) for r in traj]
    assert all(m == 0 for m in n_mis[i:])  # stays converged
    assert all(w == ws[i] for w in ws[i:])  # weights frozen after convergence


def test_empty_frame_yields_zero_trajectory(spark):
    out = perceptron_trajectory(
        _df(spark, ROWS).limit(0), ["x0", "x1", "x2"], "y", epochs=2
    ).collect()
    assert [tuple(r) for r in sorted(out)] == [(1, 0, 0, 0, 0), (2, 0, 0, 0, 0)]
