"""Dataset validation + artist filter + class normalization + SVM evaluation.

Reference semantics:

- M3 validation (db/dataset_eval.py:123-164): a dataset needs ≥2 classes and
  ≥2 recordings per class; every member mbid must have lowlevel data.
  Exceptions become a per-dataset validity frame (engine-style, not raised).
- M4/E7 artist split (dataset_eval/artistfilter.py:81-119): per (class,
  artist), the first randomly-chosen recording trains, the rest test.  The
  reference uses random.shuffle; here the shuffle is a seeded deterministic
  hash order (md5(seed||mbid)) so splits are reproducible AND partition-stable
  (SURVEY.md §7 risk 6).  Recordings with no artist are dropped, matching
  recordings_to_artists (artistfilter.py:104-112 keeps only truthy artists).
- E6 normalization (artistfilter.py:33-52): cut every class to ``cut_to``
  members (seeded-hash choice); classes SMALLER than the cut are discarded;
  removed items flow into the test set (filter(), artistfilter.py:74-77).
- M5 SVM training (dataset_eval/gaia_wrapper.py:23-96): Gaia's C/gamma grid
  search becomes pyspark.ml OneVsRest(LinearSVC) + CrossValidator over a
  regParam grid, reporting accuracy + a confusion matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MIN_CLASSES = 2
MIN_RECORDINGS_IN_CLASS = 2
NORMALIZE_CUT = 450  # artistfilter.py:75


def validate_datasets(
    dataset_class: DataFrame,
    dataset_class_member: DataFrame,
    lowlevel: DataFrame,
) -> DataFrame:
    """Per-dataset validity: (dataset, n_classes, min_class_size,
    n_missing_lowlevel, is_valid) — M3 as one aggregate pass."""
    members = dataset_class_member.join(
        dataset_class.select(F.col("id").alias("class"), "dataset"), "class"
    )
    missing = members.join(
        lowlevel.select(F.col("gid").alias("mbid")).dropDuplicates(), "mbid", "left_anti"
    ).groupBy("dataset").agg(F.count(F.lit(1)).alias("n_missing_lowlevel"))
    per_class = members.groupBy("dataset", "class").agg(F.count(F.lit(1)).alias("n"))
    per_ds = per_class.groupBy("dataset").agg(
        F.count(F.lit(1)).alias("n_classes"), F.min("n").alias("min_class_size")
    )
    return (
        per_ds.join(missing, "dataset", "left")
        .na.fill({"n_missing_lowlevel": 0})
        .withColumn(
            "is_valid",
            (F.col("n_classes") >= MIN_CLASSES)
            & (F.col("min_class_size") >= MIN_RECORDINGS_IN_CLASS)
            & (F.col("n_missing_lowlevel") == 0),
        )
    )


def recordings_to_artists(members: DataFrame, lowlevel: DataFrame, lowlevel_json: DataFrame) -> DataFrame:
    """(mbid, class, artist): first musicbrainz_artistid tag element per mbid
    (F15, artistfilter.py:124,149); artistless recordings drop out."""
    artist = (
        lowlevel.select("id", "gid")
        .join(
            lowlevel_json.select(
                "id", F.element_at(F.col("data.metadata.tags"), "musicbrainz_artistid")[0].alias("artist")
            ),
            "id",
        )
        .filter(F.col("artist").isNotNull())
        .groupBy(F.col("gid").alias("mbid"))
        .agg(F.min("artist").alias("artist"))
    )
    return members.join(artist, "mbid", "inner")


def split_groundtruth(labeled: DataFrame, seed: int = 42) -> DataFrame:
    """E7: adds ``split`` ('train'|'test') — first (seeded-hash order)
    recording per (class, artist) trains, the rest test."""
    w = Window.partitionBy("class", "artist").orderBy(
        F.md5(F.concat(F.lit(str(seed)), F.col("mbid"))), F.col("mbid")
    )
    return labeled.withColumn(
        "split", F.when(F.row_number().over(w) == 1, F.lit("train")).otherwise(F.lit("test"))
    )


def normalise_classes(labeled: DataFrame, cut_to: int = NORMALIZE_CUT, seed: int = 42) -> DataFrame:
    """E6: adds ``kept`` — classes larger than cut_to keep a seeded-hash
    sample of cut_to members; smaller classes are dropped entirely
    (normalise_datadict, artistfilter.py:33-52)."""
    w = Window.partitionBy("class").orderBy(F.md5(F.concat(F.lit(str(seed)), F.col("mbid"))), F.col("mbid"))
    sized = labeled.withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("class")))
    return (
        sized.withColumn("_rn", F.row_number().over(w))
        .withColumn("kept", (F.col("_n") > cut_to) & (F.col("_rn") <= cut_to))
        .drop("_n", "_rn")
    )


def rff_transform(
    df: DataFrame,
    features_col: str = "features",
    out_col: str | None = None,
    gamma: float = 0.1,
    n_components: int = 64,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Random Fourier Features approximation of the RBF kernel (Rahimi &
    Recht, "Random Features for Large-Scale Kernel Machines", NIPS 2007):
    z(x) = sqrt(2/D) cos(Wx + b) with W ~ N(0, 2*gamma), b ~ U[0, 2*pi], so
    E[z(x)·z(y)] = exp(-gamma*||x-y||^2) — a linear model over z approximates
    Gaia's RBF SVM (dataset_eval/gaia_wrapper.py) without a kernel matrix.

    W/b are seeded on the driver and closed over (D*dim doubles); the
    projection is one Arrow-batched numpy matmul per batch — scan-side, no
    shuffle, scale-indifferent.
    """
    import numpy as np
    import pandas  # noqa: F401

    from pyspark.sql.functions import pandas_udf

    if dim is None:
        dim = len(df.select(features_col).first()[0])
    rng = np.random.RandomState(seed)
    W = rng.normal(0.0, np.sqrt(2.0 * gamma), size=(n_components, dim))
    b = rng.uniform(0.0, 2.0 * np.pi, size=n_components)
    scale = float(np.sqrt(2.0 / n_components))

    def _rff(s: "pandas.Series") -> "pandas.Series":
        X = np.stack([np.asarray(x, dtype=np.float64) for x in s])
        Z = scale * np.cos(X @ W.T + b)
        return pandas.Series(list(Z))

    _rff.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    return df.withColumn(out_col or features_col, pandas_udf(_rff, "array<double>")(F.col(features_col)))


def _fit_linear_cv(df, reg_grid, n_folds, seed):
    from pyspark.ml.classification import LinearSVC, OneVsRest
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    svc = LinearSVC(featuresCol="_vec", labelCol="_label", maxIter=20)
    ovr = OneVsRest(classifier=svc, featuresCol="_vec", labelCol="_label")
    grid = ParamGridBuilder().addGrid(svc.regParam, list(reg_grid)).build()
    evaluator = MulticlassClassificationEvaluator(labelCol="_label", metricName="accuracy")
    cv = CrossValidator(
        estimator=ovr, estimatorParamMaps=grid, evaluator=evaluator, numFolds=n_folds, seed=seed
    )
    model = cv.fit(df)
    return model, evaluator, max(model.avgMetrics)


def train_eval_svm(
    features: DataFrame,
    label_col: str = "class_name",
    features_col: str = "features",
    reg_grid: tuple[float, ...] = (0.01, 0.1, 1.0),
    n_folds: int = 3,
    seed: int = 42,
    kernel: str = "linear",
    gamma_grid: tuple[float, ...] = (0.01, 0.1, 1.0),
    n_components: int = 64,
):
    """M5: SVM grid-search with cross-validation, mirroring Gaia's evaluation
    harness (dataset_eval/gaia_wrapper.py:23-96; grids db/dataset_eval.py:42-45).

    ``features``: rows of (label_col: string, features_col: array<double>).
    Returns (model, metrics dict with accuracy + confusion matrix rows).

    kernel="linear": OneVsRest(LinearSVC) over the C (regParam) grid.
    kernel="rbf": Gaia's C×gamma grid — each gamma fits a seeded Random
    Fourier Features map (``rff_transform``) and the C grid cross-validates
    on top, like the reference's outer preprocessing loop; the best
    (gamma, C) cell by CV accuracy wins.  metrics carries the chosen gamma.
    """
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator  # noqa: F401
    from pyspark.ml.feature import StringIndexer
    from pyspark.ml.functions import array_to_vector

    indexer = StringIndexer(
        inputCol=label_col, outputCol="_label", stringOrderType="alphabetAsc"
    ).fit(features.select(label_col))
    labels = indexer.labels

    def prepare(src: DataFrame) -> DataFrame:
        df = src.select(F.col(label_col), array_to_vector(F.col(features_col)).alias("_vec"))
        return indexer.transform(df)

    if kernel == "rbf":
        best = None
        for gamma in gamma_grid:
            mapped = rff_transform(
                features, features_col, gamma=gamma, n_components=n_components, seed=seed
            )
            df = prepare(mapped)
            model, evaluator, cv_acc = _fit_linear_cv(df, reg_grid, n_folds, seed)
            if best is None or cv_acc > best[3]:
                best = (model, evaluator, df, cv_acc, gamma)
        model, evaluator, df, cv_acc, best_gamma = best
        extra = {"kernel": "rbf", "gamma": best_gamma, "cv_accuracy": cv_acc}
    else:
        df = prepare(features)
        model, evaluator, cv_acc = _fit_linear_cv(df, reg_grid, n_folds, seed)
        extra = {"kernel": "linear", "cv_accuracy": cv_acc}

    pred = model.transform(df)
    accuracy = evaluator.evaluate(pred)
    confusion = pred.groupBy("_label", "prediction").count().collect()
    matrix = {}
    for r in confusion:
        matrix[(labels[int(r["_label"])], labels[int(r["prediction"])])] = r["count"]
    return model, {"accuracy": accuracy, "confusion": matrix, "labels": labels, **extra}


def confusion_table(
    pred: DataFrame,
    dataset_col: str = "dataset",
    actual_col: str = "actual",
    predicted_col: str = "predicted",
) -> DataFrame:
    """M5 evaluation math: the stored confusion matrix and its derived table
    (gaia_wrapper.py:104-110 simplified counts; webserver/views/datasets.py:
    658-710 prepare_table_from_cm).  One row per (dataset, actual, predicted)
    cell with:

    - ``n`` — cell count (the simplified CM value);
    - ``actual_total`` — row total for the actual class;
    - ``percentage`` — n * 100 / actual_total (datasets.py:702-703);
    - ``proportion`` — actual_total * 100 / dataset_size (datasets.py:692);
    - ``accuracy`` — per-dataset diagonal fraction (gaia_wrapper.py:116).

    One shuffle on the cell key; the window sums run on the already-aggregated
    cell relation (#classes² rows per dataset), never the prediction stream.
    """
    from pyspark.sql import Window

    counts = pred.groupBy(dataset_col, actual_col, predicted_col).agg(F.count(F.lit(1)).alias("n"))
    w_ds = Window.partitionBy(dataset_col)
    w_act = Window.partitionBy(dataset_col, actual_col)
    return (
        counts.withColumn("actual_total", F.sum("n").over(w_act))
        .withColumn("_size", F.sum("n").over(w_ds))
        .withColumn(
            "_diag",
            F.sum(F.when(F.col(actual_col) == F.col(predicted_col), F.col("n")).otherwise(F.lit(0))).over(w_ds),
        )
        .select(
            dataset_col,
            actual_col,
            predicted_col,
            "n",
            "actual_total",
            (F.col("n") * 100.0 / F.col("actual_total")).alias("percentage"),
            (F.col("actual_total") * 100.0 / F.col("_size")).alias("proportion"),
            (F.col("_diag") * 1.0 / F.col("_size")).alias("accuracy"),
        )
    )


def snapshot_dataset(
    dataset: DataFrame, dataset_class: DataFrame, dataset_class_member: DataFrame
) -> DataFrame:
    """M6: freeze each dataset into one nested document row
    (db/dataset.py:247-291): {name, description, classes: [{name, recordings}]}."""
    classes = (
        dataset_class_member.groupBy("class")
        .agg(F.sort_array(F.collect_list("mbid")).alias("recordings"))
        .join(dataset_class.select(F.col("id").alias("class"), "name", "dataset"), "class")
        .select("dataset", F.struct("name", "recordings").alias("cls"))
        .groupBy("dataset")
        .agg(F.sort_array(F.collect_list("cls")).alias("classes"))
    )
    return dataset.select(F.col("id").alias("dataset"), "name", "description").join(
        classes, "dataset", "left"
    ).select("dataset", F.struct("name", "description", "classes").alias("snapshot"))
