"""Embedding-matrix statistics: exact second moments, covariance, and
PCA projection over an ``array<double>`` embedding column.

The dimensionality-reduction / whitening step of a training-data
pipeline (decorrelate before PQ, project before clustering, audit
embedding drift between snapshots) — and the textbook case for
constant-state distributed aggregation:

- **Partials**: one ``mapInPandas`` pass accumulates (n, Σx, XᵀX) per
  PARTITION (the iterator covers every Arrow batch in the partition,
  so one dim + dim² block leaves each task — NOT one per batch). No
  raw vector ever rides a shuffle; 100 TB of embeddings reduce to
  (#partitions) × (dim² + dim + 1) doubles.
- **Reduce**: elementwise array sums via one posexplode + groupBy over
  the partial rows — thousands of rows × dim² values, trivially
  bounded, fully distributed.
- **Finish**: covariance entries are a dim²-row DataFrame (never the
  corpus); PCA eigendecomposition runs on the driver over the dim×dim
  matrix (64×64 here — bounded by DIMENSION, not data) and ships back
  into the plan as a pandas_udf GEMM closure, the same
  train-small/apply-wide discipline as ``pq_train_codebooks``.

No counterpart in the reference (``server.py`` routes only CRUD); this
extends the embedding operator family required by the north star.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _moment_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """One row per non-empty partition: (n, s = Σx, ss = flattened
    XᵀX). WHOLE-null vectors are skipped (they carry no coordinates);
    a null or NaN ELEMENT inside a vector, or ragged lengths, fail
    LOUD with a clear message — silently summing them would poison
    every covariance entry with NaN while the per-entry-null-skipping
    SQL oracle (``covar_pop``) kept returning numbers."""
    import numpy as np

    def fn(it):
        n = 0
        s = None
        ss = None
        for pdf in it:
            col = pdf[vec_col].dropna()
            if not len(col):
                continue
            try:
                x = np.asarray(col.tolist(), dtype=np.float64)
            except ValueError as e:
                raise ValueError(
                    f"embedding moments: ragged vector lengths in "
                    f"'{vec_col}' — every non-null vector must have "
                    f"the same dimension ({e})"
                ) from None
            if x.ndim != 2:
                raise ValueError(
                    f"embedding moments: ragged vector lengths in "
                    f"'{vec_col}' — every non-null vector must have "
                    "the same dimension"
                )
            if np.isnan(x).any():
                raise ValueError(
                    f"embedding moments: null/NaN element inside a "
                    f"'{vec_col}' vector — drop or impute the row "
                    "first (whole-null vectors are skipped; element "
                    "nulls would poison every covariance entry)"
                )
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    return df.select(vec_col).mapInPandas(
        fn, "n long, s array<double>, ss array<double>"
    )


def _summed_moments(df: DataFrame, vec_col: str) -> tuple[DataFrame, DataFrame]:
    """(totals, n): ``totals`` holds (pos, v) with pos < dim the mean
    numerators and pos >= dim the flattened XᵀX entries; ``n`` is the
    1-row vector count. The corpus-sized moment pass runs ONCE: the
    partials (one dim²-row per partition — tiny) are fenced behind a
    lazy localCheckpoint, so the two returned plans share its
    materialization instead of re-scanning the corpus each (shared
    lineage is not shared execution)."""
    parts = _moment_partials(df, vec_col).localCheckpoint(eager=False)
    totals = (
        parts.select(F.posexplode(F.concat("s", "ss")).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
    )
    # cross-partition ragged guard: each partition only sees its own
    # rows, so a corpus whose vector length differs BETWEEN partitions
    # passes every per-batch check — catch it where the partials meet.
    # The assert rides the 1-row n aggregate every consumer reads, so
    # any action over the moments fails loud instead of deriving a
    # silently wrong dim.
    n = parts.agg(
        F.sum("n").cast("double").alias("n"),
        F.min(F.size("s")).alias("dmin"),
        F.max(F.size("s")).alias("dmax"),
    ).select(
        F.when(
            F.assert_true(
                F.coalesce(F.col("dmin") == F.col("dmax"), F.lit(True)),
                F.lit(
                    "embedding moments: ragged vector lengths across "
                    "partitions — every non-null vector must have the "
                    "same dimension"
                ),
            ).isNull(),
            F.col("n"),
        ).alias("n")
    )
    return totals, n


def embedding_covariance(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact population covariance matrix of the embedding column as a
    (i, j, cov) DataFrame (dim² rows): ``cov = E[x_i x_j] − E[x_i]E[x_j]``
    — ``covar_pop`` semantics, so a SQL oracle can verify any block.

    The corpus is read ONCE (the moment partials); everything after is
    arithmetic over dim-bounded frames (two broadcast joins of the
    dim-row mean vector onto the dim²-row second-moment frame plus the
    1-row count — the canonical scalar-subquery plan).

    Numerical envelope: the E[xy] − E[x]E[y] form cancels
    catastrophically when ``mean² ≫ cov`` — fine for unit-scale,
    near-centered embeddings (the float64 sums keep ~15 significant
    digits, so the result holds ~15 − 2·log10(|mean|/σ) digits), but a
    corpus with large uncentered magnitudes (|mean|/σ ≳ 1e4) should be
    shifted first (``df.withColumn(vec, zip_with(vec, lit(c), (x, s) ->
    x - s))`` with any constant c near the mean — covariance is
    shift-invariant). DuckDB's ``covar_pop`` is single-pass stable, so
    degradation would surface as oracle mismatch, not silent error.
    """
    totals, n = _summed_moments(df, vec_col)
    return _cov_frame_from_totals(totals, n)


def _cov_frame_from_totals(totals: DataFrame, n: DataFrame) -> DataFrame:
    """(i, j, cov) from a summed (pos, v) moments frame + 1-row count —
    the shared finish of the batch covariance and the streaming
    moments reader. All frames are dim-bounded."""
    dim_row = totals.agg(
        # dim + dim² positions total → dim derived without a second
        # corpus scan (quadratic root of count-1/4... avoided: count
        # k satisfies k = d + d², i.e. d = (sqrt(4k+1) - 1) / 2)
        ((F.sqrt(4 * F.count("*") + 1) - 1) / 2).cast("int").alias("dim")
    )
    means = (
        totals.crossJoin(F.broadcast(dim_row))
        .filter(F.col("pos") < F.col("dim"))
        .crossJoin(F.broadcast(n))
        .select(F.col("pos").alias("k"), (F.col("v") / F.col("n")).alias("mu"))
    )
    second = (
        totals.crossJoin(F.broadcast(dim_row))
        .filter(F.col("pos") >= F.col("dim"))
        .select(
            ((F.col("pos") - F.col("dim")) / F.col("dim"))
            .cast("int")
            .alias("i"),
            ((F.col("pos") - F.col("dim")) % F.col("dim"))
            .cast("int")
            .alias("j"),
            "v",
        )
    )
    mi = means.select(F.col("k").alias("i"), F.col("mu").alias("mu_i"))
    mj = means.select(F.col("k").alias("j"), F.col("mu").alias("mu_j"))
    return (
        second.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (F.col("v") / F.col("n") - F.col("mu_i") * F.col("mu_j")).alias(
                "cov"
            ),
        )
    )


def embedding_covariance_exclude(
    df: DataFrame, retired: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Exact covariance of ``df`` WITHOUT the ``retired`` rows,
    computed by MOMENT SUBTRACTION — totals(df) − totals(retired) —
    never by re-identifying rows: the retirement move a snapshot
    pipeline pairs with ``corpus_snapshot_diff``'s *removed* output
    ("drop last quarter's crawl from the drift reference"). Sums and
    second moments are additive, so the retired batch's dim²-bounded
    partials subtract exactly; at 100 TB ``df``'s side is the moments
    the streaming accumulator already holds and only the (small)
    retired batch is scanned fresh — this function takes DataFrames
    for the demonstrable exact-parity form.

    ``retired`` MUST be a (multiset) subset of ``df``'s vectors; this
    cannot be checked from moments alone (that is the point — no row
    identity survives), so the guard is the one invariant moments do
    expose: the remaining count must be >= 1, failing LOUD on an
    over-retire that empties or overdraws the corpus. A non-subset
    with a legal count silently yields the covariance of the formal
    difference — the caller owns subset-ness (e.g. by retiring rows
    selected from the same table).
    """
    ta, na = _summed_moments(df, vec_col)
    tb, nb = _summed_moments(retired, vec_col)
    totals = (
        ta.join(tb.select("pos", F.col("v").alias("v_b")), "pos", "left")
        .select(
            "pos", (F.col("v") - F.coalesce("v_b", F.lit(0.0))).alias("v")
        )
    )
    n_rem = (
        na.crossJoin(F.broadcast(nb.select(F.col("n").alias("n_b"))))
        .crossJoin(F.broadcast(ta.agg(F.count(F.lit(1)).alias("k_a"))))
        .crossJoin(F.broadcast(tb.agg(F.count(F.lit(1)).alias("k_b"))))
        .select(
            (F.col("n") - F.coalesce("n_b", F.lit(0.0))).alias("n_raw"),
            "k_a",
            "k_b",
        )
        .select(
            F.when(
                F.assert_true(
                    # dim match first (an empty retired batch is fine):
                    # k = d + d² position rows per frame, so unequal
                    # non-zero counts mean unequal dims — a partial
                    # subtraction would be silently wrong
                    (F.col("k_b") == 0) | (F.col("k_b") == F.col("k_a")),
                    F.lit(
                        "embedding_covariance_exclude: retired batch "
                        "has a different embedding dimension than the "
                        "corpus — moment subtraction is undefined"
                    ),
                ).isNull()
                & F.assert_true(
                    F.col("n_raw") >= 1,
                    F.lit(
                        "embedding_covariance_exclude: retired batch "
                        "covers the whole corpus (or more) — remaining "
                        "count < 1; covariance of the difference is "
                        "undefined"
                    ),
                ).isNull(),
                F.col("n_raw"),
            ).alias("n")
        )
    )
    return _cov_frame_from_totals(totals, n_rem)


def embedding_correlation(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Pearson correlation matrix of the embedding column as an
    (i, j, corr) DataFrame — ``corr = cov_ij / sqrt(var_i * var_j)``,
    the redundant-dimension audit (a |corr| ≈ 1 pair means one of the
    two dims carries no information — prune it before PQ subspacing).

    Same single corpus scan as ``embedding_covariance`` (the lazily
    checkpointed moment partials are shared); the normalization is two
    broadcast joins of the dim-row diagonal onto the dim²-row
    covariance frame. Population-vs-sample doesn't matter here — the
    n / (n−1) factors cancel in the ratio, so DuckDB's ``corr()``
    verifies entries directly. A zero-variance dimension yields NULL
    correlations (0/0), matching SQL ``corr`` semantics.
    """
    cov = embedding_covariance(df, vec_col)
    diag = cov.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("k"), F.col("cov").alias("var")
    )
    di = diag.select(F.col("k").alias("i"), F.col("var").alias("var_i"))
    dj = diag.select(F.col("k").alias("j"), F.col("var").alias("var_j"))
    return (
        cov.join(F.broadcast(di), "i")
        .join(F.broadcast(dj), "j")
        .select(
            "i",
            "j",
            (
                F.col("cov") / F.sqrt(F.col("var_i") * F.col("var_j"))
            ).alias("corr"),
        )
    )


def covariance_drift(cov_a: DataFrame, cov_b: DataFrame) -> DataFrame:
    """Drift between two (i, j, cov) covariance frames (from
    ``embedding_covariance`` or ``embedding_moments_state``): a 1-row
    frame with the Frobenius norm of the difference, the norm of the
    reference (``cov_a``), and their ratio — the scalar a retrain
    scheduler thresholds ("rebuild the IVF lists when the embedding
    distribution has moved more than X% since training"). One
    dim²-row equi-join; never touches a corpus.

    Fails LOUD (in-plan assert, so any action raises) instead of
    silently yielding a NULL ratio a scheduler would never fire on:

    - **incomplete (i, j) overlap** — rides EVERY column. Covers the
      young-stream case (``embedding_moments_state`` over a state dir
      whose stream has not committed a micro-batch yet returns an
      EMPTY frame) and, because the guard requires the join to match
      BOTH inputs completely, also a dim mismatch between the frames
      (e.g. the embedding column was truncated between training and
      monitoring) — a partial-block Frobenius norm is a silently
      wrong scheduler scalar, not a smaller one.
    - **zero reference norm** — rides ``drift_ratio`` ONLY:
      constant/all-zero reference embeddings make the ratio
      0/0-undefined, but ``frobenius_diff`` is still well-defined, so
      thresholding the absolute diff for such a corpus works (read
      the diff column, not the ratio).
    """
    a = cov_a.select("i", "j", F.col("cov").alias("cov_a"))
    b = cov_b.select("i", "j", F.col("cov").alias("cov_b"))
    agg = (
        a.join(b, ["i", "j"])
        .agg(
            F.count(F.lit(1)).alias("n_entries"),
            F.sqrt(
                F.sum((F.col("cov_a") - F.col("cov_b")) ** 2)
            ).alias("frobenius_diff"),
            F.sqrt(F.sum(F.col("cov_a") ** 2)).alias("frobenius_ref"),
        )
        .crossJoin(F.broadcast(a.agg(F.count(F.lit(1)).alias("n_a"))))
        .crossJoin(F.broadcast(b.agg(F.count(F.lit(1)).alias("n_b"))))
    )
    # loud-fail discipline as in _summed_moments' ragged-dim guard:
    # the overlap assert rides every output column; the zero-ref
    # assert rides only the ratio it actually undefines
    overlap_ok = F.assert_true(
        (F.col("n_entries") > 0)
        & (F.col("n_entries") == F.col("n_a"))
        & (F.col("n_entries") == F.col("n_b")),
        F.lit(
            "covariance_drift: (i, j) entries do not fully overlap — "
            "an empty state frame (young stream: no micro-batch "
            "committed yet) or mismatched covariance dims between the "
            "two frames"
        ),
    ).isNull()
    diff_g = F.when(overlap_ok, F.col("frobenius_diff"))
    ref_g = F.when(overlap_ok, F.col("frobenius_ref"))
    ratio_g = F.when(
        overlap_ok
        & F.assert_true(
            F.col("frobenius_ref") > 0,
            F.lit(
                "covariance_drift: reference covariance norm is 0 "
                "(constant embeddings) — drift_ratio is undefined; "
                "threshold frobenius_diff directly"
            ),
        ).isNull(),
        F.col("frobenius_diff") / F.col("frobenius_ref"),
    )
    return agg.select(
        diff_g.alias("frobenius_diff"),
        ref_g.alias("frobenius_ref"),
        ratio_g.alias("drift_ratio"),
    )


def pca_train(
    df: DataFrame, k: int, vec_col: str = "embedding"
) -> tuple[list, list, list]:
    """Train a PCA basis: returns (mean, components, eigenvalues) with
    ``components`` a k×dim list (rows = principal axes, descending
    eigenvalue). Driver state is dim-bounded (the summed moments —
    dim² + dim + 1 doubles — and a dim×dim ``eigh``), never
    corpus-bounded; the corpus is scanned exactly once.

    Deterministic across runs AND partitionings: the moments are exact
    sums (order-independent up to float addition error far below
    eigengaps), and each eigenvector's sign is fixed so its
    largest-magnitude coordinate is positive (first index on ties).
    """
    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    totals, n_df = _summed_moments(df, vec_col)
    rows = totals.collect()  # dim² + dim rows — bounded by DIMENSION
    n = n_df.head().n
    if not rows or not n:
        raise ValueError("pca_train: no non-null vectors to train on")
    cnt = len(rows)
    dim = int(((4 * cnt + 1) ** 0.5 - 1) / 2)
    if k > dim:
        raise ValueError(f"k={k} exceeds embedding dim {dim}")
    v = np.zeros(cnt)
    for r in rows:
        v[r.pos] = r.v
    mean = v[:dim] / n
    cov = v[dim:].reshape(dim, dim) / n - np.outer(mean, mean)
    # symmetrize away float asymmetry before eigh (XᵀX is symmetric in
    # exact arithmetic; summation order can leave ~ulp skew)
    cov = (cov + cov.T) / 2.0
    w, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    eigvals = w[order]
    comps = vecs[:, order].T  # k × dim
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return mean.tolist(), comps.tolist(), eigvals.tolist()


def pca_project(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    out_col: str = "pc",
    mean: list | None = None,
    components: list | None = None,
) -> DataFrame:
    """Add ``out_col``: the k-dim PCA projection ``(x − mean) @ Wᵀ``.

    Trains on ``df`` itself unless a (mean, components) basis from
    ``pca_train`` is supplied — pass one to project a stream/batch
    with the CORPUS basis (the extend-with-stored-training move every
    persisted index here uses). The basis ships once inside an Arrow
    ``pandas_udf`` closure; each batch projects via one GEMM. Null
    vectors project to null.
    """
    import numpy as np

    if (mean is None) != (components is None):
        raise ValueError("pass both mean and components, or neither")
    if mean is None:
        mean, components, _ = pca_train(df, k, vec_col)
    if len(components) != k:
        raise ValueError(
            f"components rows ({len(components)}) must equal k ({k})"
        )
    mu = np.asarray(mean, dtype=np.float64)
    wt = np.asarray(components, dtype=np.float64).T  # dim × k

    def _project_fn(vs):
        na = vs.isna().to_numpy()
        res = np.empty(len(vs), dtype=object)
        res[na] = None
        if (~na).any():
            x = np.asarray(vs[~na].tolist(), dtype=np.float64)
            p = (x - mu) @ wt
            for idx, row in zip(np.flatnonzero(~na), p):
                res[idx] = row.tolist()
        return pd.Series(res)

    _project_fn.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    proj = F.pandas_udf(_project_fn, "array<double>")
    return df.withColumn(out_col, proj(F.col(vec_col)))
