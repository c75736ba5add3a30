"""Prediction explanation.

Reference behavior replaced:

- feature-name recovery from vector metadata — ``utils.py:49-67``
- vector disassembly (UDF) — ``transform.py:28-60`` → JVM-side
  ``vector_to_array`` (SURVEY.md §2.11's designated replacement)
- SHAP explanations — ``explain.py:13-107``: the reference collects a
  sample to the driver and runs ``shap.LinearExplainer`` /
  ``TreeExplainer``. This engine computes the same additive
  attributions natively and distributed, no shap dependency:
  :func:`linear_contributions` — for linear models the per-feature
  log-odds contribution coef·x IS the exact additive explanation (what
  ``shap.LinearExplainer(feature_perturbation="interventional")``
  returns, up to the expected-value offset), computed as Column
  arithmetic at any scale, no driver round-trip —
  :func:`linear_conditional_contributions` — the reference's actual
  ``feature_perturbation="correlation_dependent"`` semantics
  (``explain.py:45-62``), from one distributed covariance aggregation
  plus a driver-built Shapley transform matrix — and
  :func:`tree_contributions` (Saabas path attributions for
  RF/GBT/DecisionTree, Arrow-batched). :func:`shap_explanations`
  dispatches between them by model type.
"""

from __future__ import annotations

from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def feature_names_from_metadata(df: DataFrame, features_col: str = "features") -> list[str]:
    """Recover assembled feature names from the column's ``ml_attr``
    metadata (reference ``utils.py:49-67``)."""
    meta = df.schema[features_col].metadata
    attrs = meta["ml_attr"]["attrs"]
    named = [a for group in attrs.values() for a in group]
    return [a["name"] for a in sorted(named, key=lambda a: a["idx"])]


def vector_disassembler(
    df: DataFrame,
    columns: list[str],
    assembled_col: str = "features",
    keep: list[str] | None = None,
) -> DataFrame:
    """Split a vector column back into scalar columns (reference
    ``transform.py:28-60``, minus the Python UDF)."""
    arr = vector_to_array(F.col(assembled_col))
    return df.select(
        *(keep or []),
        *[arr.getItem(i).alias(c) for i, c in enumerate(columns)],
    )


def linear_contributions(
    predictions: DataFrame,
    model,
    features_col: str = "features",
    keep: list[str] | None = None,
    feature_names: list[str] | None = None,
) -> DataFrame:
    """Per-feature additive log-odds contributions for a linear model:
    contribution_i = coef_i · x_i, one output column per feature.

    Fully distributed (Column arithmetic over ``vector_to_array``) —
    the 100 TB-safe replacement for driver-side SHAP on linear models.
    For tree ensembles, use :func:`tree_contributions` (or the
    :func:`shap_explanations` dispatcher, which routes by model type).
    """
    names = feature_names or feature_names_from_metadata(predictions, features_col)
    coefs = list(model.coefficients)
    if len(coefs) != len(names):
        raise ValueError(f"{len(coefs)} coefficients vs {len(names)} feature names")
    arr = vector_to_array(F.col(features_col))
    return predictions.select(
        *(keep or []),
        *[
            (arr.getItem(i) * F.lit(float(c))).alias(f"contrib_{n}")
            for i, (n, c) in enumerate(zip(names, coefs))
        ],
    )


def _conditional_transform(cov, coef, exact_max: int = 12,
                           n_perms: int = 256, seed: int = 42):
    """The M×M matrix T with phi = T·(x − mu): the exact Shapley values
    of the linear model ``coef·x`` under CONDITIONAL expectations with
    features treated as multivariate Gaussian (mean mu, covariance
    ``cov``) — the semantics of the reference's
    ``shap.LinearExplainer(..., feature_perturbation=
    "correlation_dependent")`` (``/root/reference/src/sf_datalake/
    explain.py:45-62``).

    Under the Gaussian assumption, ``E[x | x_S] = mu + A_S (x − mu)``
    with ``A_S = Sigma[:, S] · pinv(Sigma[S, S])`` (rows embedded back
    into M-space, identity on S itself), so every conditional value
    ``v(S) = coef·E[x | x_S]`` is AFFINE in x and the Shapley
    combination collapses to one fixed matrix.  For M ≤ ``exact_max``
    we enumerate all subsets (exact, deterministic); above that we
    average over ``n_perms`` seeded permutations (deterministic given
    the seed — the same estimator shap uses, minus its unseeded RNG).

    Row-sum invariant: ``T.sum(axis=0) == coef`` (the ordering sum
    telescopes to ``coef·(x − mu)``), so additivity
    ``Σ phi_i = f(x) − E[f]`` holds by construction.
    """
    import itertools

    import numpy as np

    M = len(coef)
    cov = np.asarray(cov, dtype=np.float64)
    coef = np.asarray(coef, dtype=np.float64)

    def a_matrix(s: tuple[int, ...]) -> "np.ndarray":
        # A_S: M×M, (A_S)[:, S] = Sigma[:, S] pinv(Sigma[S, S]); rows in
        # S are exactly the identity rows (conditioning on observed
        # coordinates reproduces them), which pinv gives automatically
        # for nonsingular Sigma[S,S] but we enforce for degenerate ones.
        if not s:
            return np.zeros((M, M))
        s = list(s)
        a = np.zeros((M, M))
        a[:, s] = cov[:, s] @ np.linalg.pinv(cov[np.ix_(s, s)])
        a[s, :] = 0.0
        a[s, s] = 1.0
        return a

    T = np.zeros((M, M))
    if M <= exact_max:
        from math import factorial

        fact = [factorial(k) for k in range(M + 1)]
        for i in range(M):
            others = [j for j in range(M) if j != i]
            for r in range(M):
                w = fact[r] * fact[M - r - 1] / fact[M]
                for s in itertools.combinations(others, r):
                    T[i] += w * coef @ (a_matrix(s + (i,)) - a_matrix(s))
    else:
        rng = np.random.default_rng(seed)
        for _ in range(n_perms):
            perm = rng.permutation(M)
            prev = np.zeros((M, M))
            s: list[int] = []
            for i in perm:
                s.append(int(i))
                cur = a_matrix(tuple(s))
                T[i] += coef @ (cur - prev) / n_perms
                prev = cur
    return T


def linear_conditional_contributions(
    predictions: DataFrame,
    model,
    background: DataFrame | None = None,
    features_col: str = "features",
    keep: list[str] | None = None,
    feature_names: list[str] | None = None,
    exact_max: int = 12,
    n_perms: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Correlation-dependent linear SHAP, distributed: the reference's
    ``shap.LinearExplainer(..., feature_perturbation=
    "correlation_dependent")`` semantics (``explain.py:45-62``) without
    shap, driver sampling, or ``toPandas``.

    Interventional vs conditional: :func:`linear_contributions` is the
    interventional attribution (coef_i·x_i — features treated as
    independent; correlated features each get their own full credit).
    THIS function is the conditional attribution — credit for a feature
    includes what its value implies about correlated features under a
    Gaussian approximation, so two collinear features split their
    shared effect.  Migrating users of the reference's explanation
    numbers want this one; use the interventional form when you want
    attributions robust to the correlation structure of the background.

    Plan shape: ONE distributed aggregation over ``background`` (or the
    prediction frame itself) computes the feature mean vector and full
    covariance (M + M(M+1)/2 algebraic aggregates — map-side combined,
    single shuffle to one row; the reference instead sampled
    ``n_train_sample`` rows to the driver).  The M×M Shapley transform
    is built driver-side from those statistics alone (cost independent
    of row count), and applied as pure Column arithmetic — JVM codegen,
    no Python in the per-row path, 100 TB-safe.

    Output: ``keep + [base] + contrib_*`` where ``base`` is the
    expected model score ``intercept + coef·mu`` and
    ``base + Σ contrib_i`` equals the model's log-odds for the row.
    """
    names = feature_names or feature_names_from_metadata(predictions, features_col)
    coefs = [float(c) for c in model.coefficients]
    intercept = float(model.intercept)
    M = len(names)
    if len(coefs) != M:
        raise ValueError(f"{len(coefs)} coefficients vs {M} feature names")

    import numpy as np

    bg = background if background is not None else predictions
    arr = vector_to_array(F.col(features_col))
    flat = bg.select(*[arr.getItem(i).alias(f"__x{i}") for i in range(M)])
    aggs = [F.avg(f"__x{i}").alias(f"m{i}") for i in range(M)]
    for i in range(M):
        for j in range(i, M):
            aggs.append(F.covar_pop(f"__x{i}", f"__x{j}").alias(f"c{i}_{j}"))
    stats = flat.agg(*aggs).first()
    mu = np.array([stats[f"m{i}"] for i in range(M)], dtype=np.float64)
    cov = np.zeros((M, M))
    for i in range(M):
        for j in range(i, M):
            cov[i, j] = cov[j, i] = stats[f"c{i}_{j}"] or 0.0

    T = _conditional_transform(cov, coefs, exact_max, n_perms, seed)

    arr = vector_to_array(F.col(features_col))
    contribs = []
    for i, n in enumerate(names):
        expr = F.lit(0.0)
        for j in range(M):
            t = float(T[i, j])
            if t != 0.0:
                expr = expr + F.lit(t) * (arr.getItem(j) - F.lit(float(mu[j])))
        contribs.append(expr.alias(f"contrib_{n}"))
    base = intercept + float(np.dot(coefs, mu))
    return predictions.select(
        *(keep or []), F.lit(base).alias("base"), *contribs
    )


def topic_contributions(
    contributions: DataFrame,
    topic_groups: dict[str, list[str]],
    keep: list[str] | None = None,
    prefix: str = "contrib_",
) -> DataFrame:
    """Roll per-feature contributions up to named topics (reference
    ``explain.py:110-156`` + ``configuration/standard.json:136-172``):
    topic score = sum of its member features' contributions. Pure Column
    sums — stays distributed (the reference did this in driver pandas).

    ``topic_groups`` maps topic → list of FEATURE names (matched against
    ``{prefix}{feature}`` columns; missing features are skipped so
    configs survive feature-set drift)."""
    cols = set(contributions.columns)
    out_cols = []
    for topic, features in topic_groups.items():
        members = [f"{prefix}{f}" for f in features if f"{prefix}{f}" in cols]
        if members:
            col = F.col(members[0])
            for m in members[1:]:
                col = col + F.col(m)
            out_cols.append(col.alias(f"topic_{topic}"))
    return contributions.select(*(keep or []), *out_cols)


def _tree_node_value(jnode, classification: bool) -> float:
    """Scalar value of a tree node: P(class 1) from the node's impurity
    class counts for classification trees, the node mean for regression
    trees (what ``shap.TreeExplainer(..., feature_perturbation=
    "tree_path_dependent")`` calls the node value)."""
    if classification:
        stats = list(jnode.impurityStats().stats())
        total = sum(stats)
        return (stats[1] / total) if (len(stats) > 1 and total > 0) else 0.0
    return jnode.prediction()


def _flatten_tree(tree_model, classification: bool, with_cover: bool = False) -> dict:
    """Flatten one fitted pyspark.ml decision tree into parallel numpy
    arrays (feature, threshold, left, right, value) for vectorized
    traversal.  Walks the JVM node graph once on the driver — a tree is
    at most ``2^maxDepth`` nodes, negligible next to the data.

    Categorical splits store NaN as threshold and the left-category set
    in ``cats[node_id]``.  Leaves store feature ``-1``.
    """
    import numpy as np

    feat: list[int] = []
    thr: list[float] = []
    left: list[int] = []
    right: list[int] = []
    val: list[float] = []
    cover: list[float] = []
    cats: dict[int, frozenset] = {}

    def walk(jn) -> int:
        idx = len(feat)
        feat.append(-1)
        thr.append(0.0)
        left.append(-1)
        right.append(-1)
        val.append(_tree_node_value(jn, classification))
        if with_cover:  # extra py4j round trip per node: only the
            # TreeSHAP path reads covers, Saabas stays 2-calls-per-node
            cover.append(float(jn.impurityStats().count()))
        if "InternalNode" in jn.getClass().getSimpleName():
            split = jn.split()
            feat[idx] = split.featureIndex()
            if "CategoricalSplit" in split.getClass().getSimpleName():
                thr[idx] = float("nan")
                cats[idx] = frozenset(float(c) for c in split.leftCategories())
            else:
                thr[idx] = split.threshold()
            left[idx] = walk(jn.leftChild())
            right[idx] = walk(jn.rightChild())
        return idx

    walk(tree_model._call_java("rootNode"))
    return {
        "feat": np.asarray(feat, dtype=np.int64),
        "thr": np.asarray(thr, dtype=np.float64),
        "left": np.asarray(left, dtype=np.int64),
        "right": np.asarray(right, dtype=np.int64),
        "val": np.asarray(val, dtype=np.float64),
        "cover": np.asarray(cover, dtype=np.float64) if with_cover else None,
        "cats": cats,
    }


def _tree_path_contribs(tree: dict, X):
    """Saabas path contributions for one flattened tree over a feature
    matrix: walking root→leaf, attribute ``value(child) − value(node)``
    to the split feature.  Vectorized: one numpy step per tree level,
    all rows advance together.  Returns ``(contrib[n, d], root_value)``.

    Continuous splits use Spark's ``x <= threshold`` convention; a NaN
    feature compares false and goes right, matching the JVM predictor.
    """
    import numpy as np

    n, d = X.shape
    contrib = np.zeros((n, d))
    node = np.zeros(n, dtype=np.int64)
    feat, thr, left, right, val, cats = (
        tree["feat"], tree["thr"], tree["left"], tree["right"], tree["val"], tree["cats"],
    )
    while True:
        active = np.nonzero(feat[node] >= 0)[0]
        if active.size == 0:
            break
        nd = node[active]
        f = feat[nd]
        xv = X[active, f]
        with np.errstate(invalid="ignore"):
            go_left = xv <= thr[nd]  # NaN threshold (categorical) → False, fixed below
        if cats:
            for j in np.nonzero(np.isnan(thr[nd]))[0]:
                go_left[j] = xv[j] in cats[nd[j]]
        child = np.where(go_left, left[nd], right[nd])
        contrib[active, f] += val[child] - val[nd]
        node[active] = child
    return contrib, float(val[0])


def _go_left(tree: dict, node: int, x) -> bool:
    """One split decision, matching the JVM predictor: continuous uses
    ``x <= threshold`` (NaN goes right); categorical membership in the
    left-category set."""
    import math

    f = tree["feat"][node]
    t = tree["thr"][node]
    xv = x[f]
    if math.isnan(t):  # categorical split
        return xv in tree["cats"][node]
    return bool(xv <= t)


def _tree_shap_row(tree: dict, x, phi) -> None:
    """Exact path-dependent TreeSHAP for ONE tree and ONE row (feature
    values), accumulated into ``phi`` — thin wrapper over
    :func:`_tree_shap_core` with live split evaluation."""
    _tree_shap_core(tree, lambda node: _go_left(tree, node, x), phi)


def _tree_shap_core(tree: dict, go_left, phi) -> None:
    """Exact path-dependent TreeSHAP for ONE tree and ONE row,
    accumulated into ``phi`` (length n_features).  ``go_left(node)``
    supplies the row's split decision at each internal node.

    The polynomial-time recursion of Lundberg, Erion & Lee 2018
    ("Consistent Individualized Feature Attribution for Tree
    Ensembles", Algorithm 2): walk every root→leaf path once while
    maintaining, for each subset size, the summed proportion of feature
    subsets that reach the node — EXTEND adds a path feature with its
    cover fraction (``zero``) and decision indicator (``one``), UNWIND
    removes one (features revisited on a path merge multiplicatively).
    Cost O(L · D²) per tree per row versus the exponential subset
    enumeration it replaces.

    Differs from Saabas (:func:`_tree_path_contribs`) by weighting
    every subset-conditional expectation, not just the single observed
    path — on correlated/asymmetric splits Saabas over-attributes to
    deep features; TreeSHAP is the unique consistent allocation.
    Matches ``shap.TreeExplainer(feature_perturbation=
    "tree_path_dependent")`` (reference behavior:
    ``/root/reference/src/sf_datalake/explain.py:84-107``).

    The path state is parallel Python lists (d, zero, one, w); path
    length is bounded by tree depth+1, so list ops dominate nothing.
    """
    feat = tree["feat"]
    left = tree["left"]
    right = tree["right"]
    val = tree["val"]
    cover = tree["cover"]

    def extend(pd, pz, po, pw, d, z, o):
        l = len(pd)
        pd = pd + [d]
        pz = pz + [z]
        po = po + [o]
        pw = pw + [1.0 if l == 0 else 0.0]
        for i in range(l - 1, -1, -1):
            pw[i + 1] += o * pw[i] * (i + 1) / (l + 1)
            pw[i] = z * pw[i] * (l - i) / (l + 1)
        return pd, pz, po, pw

    def unwind(pd, pz, po, pw, i):
        l = len(pd) - 1
        z, o = pz[i], po[i]
        pd, pz, po, pw = pd[:], pz[:], po[:], pw[:]
        n = pw[l]
        for j in range(l - 1, -1, -1):
            if o != 0.0:
                t = pw[j]
                pw[j] = n * (l + 1) / ((j + 1) * o)
                n = t - pw[j] * z * (l - j) / (l + 1)
            else:
                pw[j] = pw[j] * (l + 1) / (z * (l - j))
        del pd[i], pz[i], po[i], pw[l]
        # shift the removed slot out while keeping relative order
        return pd, pz, po, pw

    def unwound_sum(pz, po, pw, i):
        l = len(pz) - 1
        z, o = pz[i], po[i]
        total = 0.0
        if o != 0.0:
            n = pw[l]
            for j in range(l - 1, -1, -1):
                t = n * (l + 1) / ((j + 1) * o)
                total += t
                n = pw[j] - t * z * (l - j) / (l + 1)
        else:
            for j in range(l - 1, -1, -1):
                total += pw[j] * (l + 1) / (z * (l - j))
        return total

    def recurse(node, pd, pz, po, pw, parent_zero, parent_one, parent_d):
        pd, pz, po, pw = extend(pd, pz, po, pw, parent_d, parent_zero, parent_one)
        if feat[node] < 0:  # leaf
            leaf_v = val[node]
            for i in range(1, len(pd)):
                w = unwound_sum(pz, po, pw, i)
                phi[pd[i]] += w * (po[i] - pz[i]) * leaf_v
            return
        hot, cold = (
            (left[node], right[node])
            if go_left(node)
            else (right[node], left[node])
        )
        iz, io = 1.0, 1.0
        f = feat[node]
        for k in range(1, len(pd)):
            if pd[k] == f:  # feature already on the path: merge
                iz, io = pz[k], po[k]
                pd, pz, po, pw = unwind(pd, pz, po, pw, k)
                break
        recurse(hot, pd, pz, po, pw, iz * cover[hot] / cover[node], io, f)
        recurse(cold, pd, pz, po, pw, iz * cover[cold] / cover[node], 0.0, f)

    recurse(0, [], [], [], [], 1.0, 1.0, -1)


def _decision_matrix(tree: dict, X):
    """Vectorized per-node split decisions: ``D[r, j] = 1`` iff row r
    goes LEFT at internal node j (positions for leaves are 0/unused).
    One numpy pass per internal node — no per-row Python."""
    import numpy as np

    n = X.shape[0]
    feat, thr, cats = tree["feat"], tree["thr"], tree["cats"]
    internal = np.nonzero(feat >= 0)[0]
    D = np.zeros((n, len(feat)), dtype=np.uint8)
    for j in internal:
        xv = X[:, feat[j]]
        if np.isnan(thr[j]):  # categorical
            leftset = cats[j]
            D[:, j] = np.fromiter(
                (v in leftset for v in xv), dtype=np.uint8, count=n
            )
        else:
            with np.errstate(invalid="ignore"):
                D[:, j] = (xv <= thr[j]).astype(np.uint8)
    return D


def _tree_shap_contribs(tree: dict, X):
    """TreeSHAP over a feature matrix.  The recursion's output depends
    on the row only through its LEFT/RIGHT decision at each internal
    node, so rows are deduplicated by that decision bitmap first (one
    vectorized pass) and the O(L·D²) recursion runs once per UNIQUE
    pattern — on real scoring sets patterns number far below rows
    (bounded by ∏ per-feature distinct split outcomes, often a few
    hundred against millions of rows).  Returns ``(phi[n, d],
    root_value)`` — same contract as :func:`_tree_path_contribs` so
    callers swap methods freely."""
    import numpy as np

    n, d = X.shape
    out = np.zeros((n, d))
    if n == 0:
        return out, float(tree["val"][0])
    D = _decision_matrix(tree, X)
    patterns, inverse = np.unique(D, axis=0, return_inverse=True)
    phi_u = np.zeros((len(patterns), d))
    for p in range(len(patterns)):
        _tree_shap_row_decisions(tree, patterns[p], phi_u[p])
    out[:] = phi_u[inverse.ravel()]
    return out, float(tree["val"][0])


def _tree_shap_row_decisions(tree: dict, decisions, phi) -> None:
    """:func:`_tree_shap_row` driven by a precomputed decision bitmap
    (``decisions[j]`` = row goes left at node j) instead of raw feature
    values — the dedup-friendly form."""
    _tree_shap_core(tree, lambda node: bool(decisions[node]), phi)


def tree_contributions(
    predictions: DataFrame,
    model,
    features_col: str = "features",
    keep: list[str] | None = None,
    feature_names: list[str] | None = None,
    method: str = "saabas",
) -> DataFrame:
    """Distributed per-feature additive contributions for tree-ensemble
    models — the shap-free replacement for the reference's driver-side
    ``shap.TreeExplainer``
    (``/root/reference/src/sf_datalake/explain.py:63-107``).

    ``method="saabas"`` (default): observed-path attributions — O(depth)
    per row, the fast screening path.  ``method="tree_shap"``: exact
    path-dependent TreeSHAP (Lundberg 2018 polynomial recursion) —
    O(leaves · depth²) per row, the unique consistent allocation and
    the reference's TreeExplainer semantics.  Both satisfy
    ``base + Σ contrib = prediction`` exactly and agree on depth-1
    trees; they differ on deeper trees with asymmetric/correlated
    splits (TreeSHAP credits every subset-conditional expectation,
    Saabas only the observed path).

    Per row: ``base + Σ_i contrib_i`` equals exactly

    - RandomForest classification → P(class 1) (Spark averages per-tree
      leaf class distributions);
    - RandomForest / DecisionTree regression → the prediction;
    - GBT (classification or regression) → the weighted-sum margin
      ``F(x) = Σ_t w_t · h_t(x)``; for GBTClassifier the probability is
      ``sigmoid(2·F(x))``, so contributions live in margin space (the
      same convention as shap's ``model_output="raw"``).

    Trees are flattened once on the driver (cheap) and shipped in the
    task closure; scoring is an Arrow-batched ``mapInPandas`` numpy
    traversal — no per-row Python, no driver round-trip of data rows,
    scales with the input like any other map.  Output columns are
    ``keep + base + contrib_{feature}``, matching
    :func:`linear_contributions` so :func:`topic_contributions` and the
    frontend layer consume either interchangeably.
    """
    import numpy as np

    if method not in ("saabas", "tree_shap", "both"):
        raise ValueError(f"unknown method {method!r}: saabas | tree_shap | both")
    # "both" computes TreeSHAP and Saabas in ONE Arrow pass (columns
    # ``contrib_*`` and ``saabas_*``): comparison workloads otherwise
    # traverse the whole upstream pipeline twice and join the results
    # back — at scale that is two scans plus a shuffle for what one
    # batch loop produces for free.
    contrib_fn = _tree_shap_contribs if method != "saabas" else _tree_path_contribs
    names = feature_names or feature_names_from_metadata(predictions, features_col)
    cls = type(model).__name__
    classification = "Classification" in cls
    if hasattr(model, "trees"):
        jtrees = model.trees
        raw_w = list(model.treeWeights)
        if cls.startswith("RandomForest"):
            # Spark averages tree votes/means: normalize to 1/numTrees.
            raw_w = [w / sum(raw_w) for w in raw_w]
        # GBT trees are regression trees even in the classifier (margin space).
        trees_classification = classification and not cls.startswith("GBT")
    else:  # single DecisionTree*Model
        jtrees, raw_w, trees_classification = [model], [1.0], classification
    flat = [
        _flatten_tree(t, trees_classification, with_cover=(method != "saabas"))
        for t in jtrees
    ]
    weights = [float(w) for w in raw_w]
    d = len(names)
    keep = keep or []

    base = float(sum(w * t["val"][0] for t, w in zip(flat, weights)))
    in_df = predictions.withColumn("_fx", vector_to_array(F.col(features_col)))
    keep_fields = [in_df.schema[c] for c in keep]
    out_schema = T.StructType(
        keep_fields
        + [T.StructField("base", T.DoubleType())]
        + [T.StructField(f"contrib_{n}", T.DoubleType()) for n in names]
        + ([T.StructField(f"saabas_{n}", T.DoubleType()) for n in names]
           if method == "both" else [])
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_fx"]])
            if X.shape[1] != d:
                raise ValueError(f"feature vector width {X.shape[1]} != {d} names")
            total = np.zeros((len(pdf), d))
            total_sa = np.zeros((len(pdf), d)) if method == "both" else None
            for tree, w in zip(flat, weights):
                c, _ = contrib_fn(tree, X)
                total += w * c
                if total_sa is not None:
                    sa, _ = _tree_path_contribs(tree, X)
                    total_sa += w * sa
            out = pdf[keep].copy()
            out["base"] = base
            for i, n in enumerate(names):
                out[f"contrib_{n}"] = total[:, i]
            if total_sa is not None:
                for i, n in enumerate(names):
                    out[f"saabas_{n}"] = total_sa[:, i]
            yield out

    return in_df.select(*keep, "_fx").mapInPandas(score, out_schema)


def shap_explanations(
    predictions: DataFrame,
    model,
    features_col: str = "features",
    keep: list[str] | None = None,
    feature_names: list[str] | None = None,
    tree_method: str = "tree_shap",
) -> DataFrame:
    """Additive per-feature attributions for any supported model — the
    engine-native replacement for the reference's driver-side shap calls
    (``/root/reference/src/sf_datalake/explain.py:13-107``).

    The reference collects a sample to the driver and runs
    ``shap.LinearExplainer`` / ``TreeExplainer``; this dispatcher
    computes the same additive attributions distributed and shap-free:
    linear models route to :func:`linear_contributions` (coef·x is
    exactly the interventional LinearExplainer attribution, up to the
    expected-value offset) and tree ensembles to
    :func:`tree_contributions` with ``method="tree_shap"`` — the exact
    path-dependent TreeSHAP recursion, the same semantics as the
    reference's ``TreeExplainer`` (additivity contract
    ``base + Σ contrib = prediction``).  Pass ``tree_method="saabas"``
    for the O(depth) observed-path screening variant.  Both return
    ``keep + [base] + contrib_*`` columns consumable by
    :func:`topic_contributions` and the frontend layer.
    """
    # Probe with try/except, not hasattr: MLlib model properties are
    # py4j calls, and e.g. multinomial LogisticRegressionModel raises a
    # SparkException (not AttributeError) from `.coefficients` — hasattr
    # would propagate it as an opaque Py4JJavaError. Catch only the
    # not-a-binomial-linear-model shapes; infrastructure failures
    # (dead JVM, network) must surface as themselves.
    from py4j.protocol import Py4JJavaError

    from pyspark.errors import PySparkException

    try:
        coefs = model.coefficients
        intercept = float(model.intercept)
    except (AttributeError, Py4JJavaError, PySparkException):
        coefs = None
    if coefs is not None:
        out = linear_contributions(
            predictions, model, features_col, keep, feature_names
        )
        # align with tree_contributions' output contract (base column)
        return out.select(
            *(keep or []),
            F.lit(intercept).alias("base"),
            *[c for c in out.columns if c.startswith("contrib_")],
        )
    if hasattr(model, "trees") or type(model).__name__.startswith("DecisionTree"):
        return tree_contributions(
            predictions, model, features_col, keep, feature_names,
            method=tree_method,
        )
    raise ValueError(
        f"unsupported model type {type(model).__name__}: expected a binomial "
        "linear model (coefficients/intercept; multinomial models expose "
        "coefficientMatrix and are not supported here) or a tree "
        "model/ensemble (trees)"
    )
