"""Learned pairwise matcher (reference M1-M4) — numpy logistic regression.

The reference trains StandardScaler + {logreg|rf|xgb} with 5-fold
stratified OOF and picks the F1-optimal threshold
(/root/reference/models/pairwise_classifier.py:284-371,239-256). This
container has no sklearn/xgboost, and SURVEY.md §7 prefers a
deterministic matcher anyway — so: a from-scratch numpy logistic
regression (full-batch gradient descent, fixed iterations/seed →
bit-deterministic), trained driver-side on the (small) labeled sample,
then broadcast into an Arrow UDF for distributed scoring. Same
train-small/score-big shape the reference has, minus the randomness.

Labels are always dimension-sized (human/ground-truth pairs), so
driver-side training is the correct scale split: the expensive part —
scoring billions of candidate pairs — is the distributed UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from entity_resolution__spark.functions.features import FEATURE_COLS


@dataclass
class TrainedMatcher:
    """Analog of the reference's TrainedMatcher dataclass
    (models/pairwise_classifier.py:214-234): scaler stats + weights +
    chosen threshold + CV metrics."""

    mean: np.ndarray
    std: np.ndarray
    weights: np.ndarray  # (n_features + 1,) with bias last
    threshold: float
    feature_cols: list[str]
    metrics: dict

    def predict_proba(self, X: pd.DataFrame) -> np.ndarray:
        Z = (X[self.feature_cols].to_numpy(dtype=np.float64) - self.mean) / self.std
        z = Z @ self.weights[:-1] + self.weights[-1]
        return 1.0 / (1.0 + np.exp(-z))


def _fit_logreg(
    X: np.ndarray, y: np.ndarray, lr: float = 0.5, iters: int = 500, l2: float = 1e-3
) -> np.ndarray:
    """Full-batch GD with class-balanced weights (reference
    scale_pos_weight analog, pairwise_classifier.py:301-304)."""
    n, d = X.shape
    w = np.zeros(d + 1)
    pos = max(y.sum(), 1)
    neg = max(n - y.sum(), 1)
    sw = np.where(y == 1, n / (2 * pos), n / (2 * neg))
    Xb = np.hstack([X, np.ones((n, 1))])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        g = Xb.T @ (sw * (p - y)) / n + l2 * np.r_[w[:-1], 0.0]
        w -= lr * g
    return w


@dataclass
class BoostedMatcher:
    """Gradient-boosted decision stumps with logistic loss — the
    deterministic stand-in for the reference's XGBoost option
    (models/pairwise_classifier.py:271-279: 600 trees, depth 6; here:
    shallow stumps, fixed round count, quantile split grid — no RNG, so
    (data, params) → bit-identical model). Same predict_proba/threshold/
    feature_cols surface as TrainedMatcher, so it drops into
    apply_matcher / apply_model_udf unchanged."""

    base: float
    stumps: list  # (feat_idx, split, left_add, right_add)
    mean: np.ndarray
    std: np.ndarray
    threshold: float
    feature_cols: list[str]
    metrics: dict

    def predict_proba(self, X: pd.DataFrame) -> np.ndarray:
        Z = (X[self.feature_cols].to_numpy(dtype=np.float64) - self.mean) / self.std
        z = np.full(len(Z), self.base)
        for j, t, vl, vr in self.stumps:
            z += np.where(Z[:, j] <= t, vl, vr)
        return 1.0 / (1.0 + np.exp(-z))


@dataclass
class XGBMatcher:
    """Opt-in wrapper around the ACTUAL xgboost library with the
    reference's exact hyperparameters (models/pairwise_classifier.py:
    271-279: 600 trees, depth 6, lr 0.05, subsample/colsample 0.9,
    hist, logloss, scale_pos_weight, seed 42) for deployments that
    have it installed and accept its floating-point nondeterminism.
    The default engine path stays the deterministic Newton trees
    (BoostedTreeMatcher) — same capacity shape, bit-reproducible.
    Same predict_proba/threshold/feature_cols surface, so the pickled
    booster broadcasts into apply_matcher unchanged."""

    booster: object  # xgboost.XGBClassifier (picklable)
    mean: np.ndarray
    std: np.ndarray
    threshold: float
    feature_cols: list[str]
    metrics: dict

    def predict_proba(self, X: pd.DataFrame) -> np.ndarray:
        Z = (X[self.feature_cols].to_numpy(dtype=np.float64) - self.mean) / self.std
        return self.booster.predict_proba(Z)[:, 1]


def _fit_xgb(X: np.ndarray, y: np.ndarray, seed: int = 42):
    """Reference hyperparameters verbatim; n_jobs pinned to 1 (the
    reference's -1 adds thread-schedule nondeterminism on top of
    hist's float accumulation — one of the two is avoidable)."""
    try:
        from xgboost import XGBClassifier
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "model='xgb' needs the xgboost package (pip install xgboost); "
            "the built-in deterministic equivalent is model='gbdt', depth=6"
        ) from e
    pos = max(float(y.sum()), 1.0)
    neg = max(float(len(y) - y.sum()), 1.0)
    clf = XGBClassifier(
        n_estimators=600,
        max_depth=6,
        learning_rate=0.05,
        subsample=0.9,
        colsample_bytree=0.9,
        reg_lambda=1.0,
        objective="binary:logistic",
        tree_method="hist",
        n_jobs=1,
        eval_metric="logloss",
        scale_pos_weight=neg / pos,
        random_state=seed,
    )
    clf.fit(X, y.astype(int))
    return clf


def _fit_stumps(
    X: np.ndarray,
    y: np.ndarray,
    rounds: int = 60,
    lr: float = 0.3,
    n_bins: int = 16,
) -> tuple[float, list]:
    """Newton-step stump boosting (XGBoost's split objective with
    depth=1): per round pick the (feature, quantile-split) maximizing
    gl²/hl + gr²/hr over a FIXED candidate grid — deterministic, ties
    resolved by scan order."""
    n, d = X.shape
    cand = [
        np.unique(np.quantile(X[:, j], np.linspace(0.05, 0.95, n_bins)))
        for j in range(d)
    ]
    p0 = float(np.clip(y.mean(), 1e-6, 1.0 - 1e-6))
    base = float(np.log(p0 / (1.0 - p0)))
    Fv = np.full(n, base)
    stumps: list = []
    for _ in range(rounds):
        p = 1.0 / (1.0 + np.exp(-Fv))
        g = y - p
        h = np.maximum(p * (1.0 - p), 1e-6)
        best = None
        for j in range(d):
            xj = X[:, j]
            for t in cand[j]:
                mask = xj <= t
                gl, gr = g[mask].sum(), g[~mask].sum()
                hl, hr = max(h[mask].sum(), 1e-9), max(h[~mask].sum(), 1e-9)
                gain = gl * gl / hl + gr * gr / hr
                if best is None or gain > best[0] + 1e-12:
                    best = (gain, j, float(t), gl / hl, gr / hr)
        _, j, t, vl, vr = best
        vl *= lr
        vr *= lr
        Fv += np.where(X[:, j] <= t, vl, vr)
        stumps.append((j, t, vl, vr))
    return base, stumps


def _tree_predict(node: tuple, Z: np.ndarray) -> np.ndarray:
    """Vectorized traversal of a nested ("leaf", v) / ("split", j, t, l, r)
    tree over the standardized feature matrix."""
    if node[0] == "leaf":
        return np.full(len(Z), node[1])
    _, j, t, left, right = node
    mask = Z[:, j] <= t
    out = np.empty(len(Z))
    out[mask] = _tree_predict(left, Z[mask])
    out[~mask] = _tree_predict(right, Z[~mask])
    return out


@dataclass
class BoostedTreeMatcher:
    """Fixed-depth Newton-boosted trees — closes the declared M1
    capacity gap between depth-1 stumps and the reference's depth-6
    XGBoost (models/pairwise_classifier.py:271-279). Same quantile
    candidate grid and Newton split objective as the stump fit, grown
    greedily to ``depth`` levels; no RNG anywhere, ties resolved by scan
    order, so (data, params) → bit-identical model. Same predict_proba/
    threshold/feature_cols surface as TrainedMatcher/BoostedMatcher."""

    base: float
    trees: list  # nested ("leaf", v) | ("split", j, t, left, right)
    mean: np.ndarray
    std: np.ndarray
    threshold: float
    feature_cols: list[str]
    metrics: dict

    def predict_proba(self, X: pd.DataFrame) -> np.ndarray:
        Z = (X[self.feature_cols].to_numpy(dtype=np.float64) - self.mean) / self.std
        z = np.full(len(Z), self.base)
        for tree in self.trees:
            z += _tree_predict(tree, Z)
        return 1.0 / (1.0 + np.exp(-z))


def _scale_leaves(node: tuple, lr: float) -> tuple:
    if node[0] == "leaf":
        return ("leaf", node[1] * lr)
    _, j, t, left, right = node
    return ("split", j, t, _scale_leaves(left, lr), _scale_leaves(right, lr))


def _fit_one_tree(
    X: np.ndarray, g: np.ndarray, h: np.ndarray, cand: list, depth: int
) -> tuple:
    """One depth-limited regression tree on (gradient, hessian) with
    Newton leaf values G/H — XGBoost's exact-greedy objective restricted
    to the fixed per-feature quantile grid. Splits that would leave a
    side empty are skipped; a node with no valid split becomes a leaf."""

    def build(idx: np.ndarray, d: int) -> tuple:
        G = g[idx].sum()
        H = max(h[idx].sum(), 1e-9)
        if d == 0 or len(idx) < 2:
            return ("leaf", G / H)
        best = None
        for j in range(X.shape[1]):
            xj = X[idx, j]
            for t in cand[j]:
                mask = xj <= t
                nl = int(mask.sum())
                if nl == 0 or nl == len(idx):
                    continue
                gl = g[idx[mask]].sum()
                hl = max(h[idx[mask]].sum(), 1e-9)
                gr = G - gl
                hr = max(H - hl, 1e-9)
                gain = gl * gl / hl + gr * gr / hr
                if best is None or gain > best[0] + 1e-12:
                    best = (gain, j, float(t), mask)
        if best is None:
            return ("leaf", G / H)
        _, j, t, mask = best
        return ("split", j, t, build(idx[mask], d - 1), build(idx[~mask], d - 1))

    return build(np.arange(len(g)), depth)


def _fit_trees(
    X: np.ndarray,
    y: np.ndarray,
    rounds: int = 60,
    lr: float = 0.3,
    n_bins: int = 16,
    depth: int = 2,
) -> tuple[float, list]:
    """Newton tree boosting at fixed depth — the depth>1 generalization
    of ``_fit_stumps`` (same grid, same logistic g/h, same base score)."""
    n, d = X.shape
    cand = [
        np.unique(np.quantile(X[:, j], np.linspace(0.05, 0.95, n_bins)))
        for j in range(d)
    ]
    p0 = float(np.clip(y.mean(), 1e-6, 1.0 - 1e-6))
    base = float(np.log(p0 / (1.0 - p0)))
    Fv = np.full(n, base)
    trees: list = []
    for _ in range(rounds):
        p = 1.0 / (1.0 + np.exp(-Fv))
        g = y - p
        h = np.maximum(p * (1.0 - p), 1e-6)
        tree = _scale_leaves(_fit_one_tree(X, g, h, cand, depth), lr)
        Fv += _tree_predict(tree, X)
        trees.append(tree)
    return base, trees


def roc_auc(y: np.ndarray, s: np.ndarray) -> float:
    """Rank-based AUC (Mann-Whitney), ties averaged — numpy only."""
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), dtype=np.float64)
    ranks[order] = np.arange(1, len(s) + 1)
    # average ranks for ties
    sorted_s = s[order]
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def pr_auc(y: np.ndarray, s: np.ndarray) -> float:
    """Average precision (the reference's average_precision_score,
    models/pairwise_classifier.py:328,342): AP = Σ (R_i − R_{i−1})·P_i
    over the descending-score sweep, ties handled by grouping equal
    scores — numpy only."""
    n_pos = int(y.sum())
    if n_pos == 0:
        return 0.0
    order = np.argsort(-s, kind="mergesort")
    ys = y[order]
    ss = s[order]
    tp = np.cumsum(ys)
    fp = np.cumsum(1 - ys)
    # evaluate only at the last index of each tied-score group
    last = np.r_[ss[1:] != ss[:-1], True]
    tp, fp = tp[last], fp[last]
    precision = tp / np.maximum(tp + fp, 1)
    recall = tp / n_pos
    prev_r = np.r_[0.0, recall[:-1]]
    return float(((recall - prev_r) * precision).sum())


def f1_optimal_threshold(y: np.ndarray, s: np.ndarray) -> tuple[float, float]:
    """Sweep unique scores, return (threshold, best F1)
    (reference M2, pairwise_classifier.py:239-256)."""
    best_t, best_f1 = 0.5, -1.0
    for t in np.unique(np.round(s, 6)):
        pred = s >= t
        tp = int((pred & (y == 1)).sum())
        fp = int((pred & (y == 0)).sum())
        fn = int(((~pred) & (y == 1)).sum())
        if tp == 0:
            continue
        p, r = tp / (tp + fp), tp / (tp + fn)
        f1 = 2 * p * r / (p + r)
        if f1 > best_f1:
            best_t, best_f1 = float(t), float(f1)
    return best_t, best_f1


def train_matcher(
    labeled_features: pd.DataFrame,
    feature_cols: list[str] | None = None,
    n_folds: int = 5,
    seed: int = 42,
    model: str = "logreg",
    depth: int = 1,
) -> TrainedMatcher | BoostedMatcher | BoostedTreeMatcher | XGBMatcher:
    """5-fold stratified OOF CV → F1-optimal threshold → refit on all
    (reference M1+M2, pairwise_classifier.py:284-371). Deterministic in
    (data, seed). ``model``: "logreg" (default), "gbdt" (boosted
    stumps — the reference's {logreg|rf|xgb} choice, pairwise_
    classifier.py:259-279, minus the nondeterminism), or "xgb" (the
    REAL xgboost library with the reference's exact hyperparameters —
    opt-in, requires the package, forfeits bit-determinism). ``depth``
    > 1 with model="gbdt" grows fixed-depth Newton trees instead of
    stumps (closes the stump-vs-XGBoost capacity gap on interaction
    features; depth=1 keeps the legacy bit-exact stump path)."""
    cols = feature_cols or FEATURE_COLS
    X = labeled_features[cols].to_numpy(dtype=np.float64)
    y = labeled_features["label"].to_numpy(dtype=np.float64)
    mean = X.mean(axis=0)
    std = np.where(X.std(axis=0) > 0, X.std(axis=0), 1.0)
    Z = (X - mean) / std

    def fit_predict(Ztr, ytr, Zte):
        if model == "xgb":
            return _fit_xgb(Ztr, ytr, seed=seed).predict_proba(Zte)[:, 1]
        if model == "gbdt" and depth > 1:
            base, trees = _fit_trees(Ztr, ytr, depth=depth)
            z = np.full(len(Zte), base)
            for tree in trees:
                z += _tree_predict(tree, Zte)
            return 1.0 / (1.0 + np.exp(-z))
        if model == "gbdt":
            base, stumps = _fit_stumps(Ztr, ytr)
            z = np.full(len(Zte), base)
            for j, t, vl, vr in stumps:
                z += np.where(Zte[:, j] <= t, vl, vr)
            return 1.0 / (1.0 + np.exp(-z))
        w = _fit_logreg(Ztr, ytr)
        return 1.0 / (
            1.0 + np.exp(-(np.hstack([Zte, np.ones((len(Zte), 1))]) @ w))
        )

    # stratified folds, deterministic
    rng = np.random.default_rng(seed)
    folds = np.zeros(len(y), dtype=int)
    for cls in (0, 1):
        idx = np.where(y == cls)[0]
        rng.shuffle(idx)
        folds[idx] = np.arange(len(idx)) % n_folds

    oof = np.zeros(len(y))
    fold_reports = []
    for k in range(n_folds):
        tr, te = folds != k, folds == k
        if te.sum() == 0 or len(np.unique(y[tr])) < 2:
            continue
        p = fit_predict(Z[tr], y[tr], Z[te])
        oof[te] = p
        fold_reports.append(
            {
                "fold": k + 1,
                "roc_auc": float(roc_auc(y[te], p)),
                "pr_auc": float(pr_auc(y[te], p)),
            }
        )

    thr, oof_f1 = f1_optimal_threshold(y, oof)
    # metric names mirror the reference metrics dict
    # (models/pairwise_classifier.py:345-356); oof_auc kept as an alias
    metrics = {
        "oof_roc_auc": roc_auc(y, oof),
        "oof_pr_auc": pr_auc(y, oof),
        "oof_auc": roc_auc(y, oof),
        "oof_f1_at_threshold": oof_f1,
        "cv_folds": fold_reports,
        "fold_aucs": [f["roc_auc"] for f in fold_reports],
        "pos_frac": float(y.mean()),
        "n_pos": int(y.sum()),
        "n": len(y),
    }
    if model == "xgb":
        return XGBMatcher(
            booster=_fit_xgb(Z, y, seed=seed),
            mean=mean,
            std=std,
            threshold=thr,
            feature_cols=list(cols),
            metrics=metrics,
        )
    if model == "gbdt" and depth > 1:
        base, trees = _fit_trees(Z, y, depth=depth)
        return BoostedTreeMatcher(
            base=base,
            trees=trees,
            mean=mean,
            std=std,
            threshold=thr,
            feature_cols=list(cols),
            metrics=metrics,
        )
    if model == "gbdt":
        base, stumps = _fit_stumps(Z, y)
        return BoostedMatcher(
            base=base,
            stumps=stumps,
            mean=mean,
            std=std,
            threshold=thr,
            feature_cols=list(cols),
            metrics=metrics,
        )
    w_full = _fit_logreg(Z, y)
    return TrainedMatcher(
        mean=mean,
        std=std,
        weights=w_full,
        threshold=thr,
        feature_cols=list(cols),
        metrics=metrics,
    )


def apply_matcher(features_df: DataFrame, model: TrainedMatcher) -> DataFrame:
    """Distributed scoring: broadcast model → Arrow-batched predict
    (reference M3, applied at scripts/train_classifier.py:24-30)."""
    cols = model.feature_cols

    @pandas_udf(T.DoubleType())
    def predict(*feats: pd.Series) -> pd.Series:
        X = pd.concat(feats, axis=1)
        X.columns = cols
        return pd.Series(model.predict_proba(X))

    df = features_df.withColumn("prob_match", predict(*[F.col(c) for c in cols]))
    return df.withColumn(
        "pred_match", (F.col("prob_match") >= F.lit(model.threshold)).cast("int")
    )
