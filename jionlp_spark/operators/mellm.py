"""Distributed MELLM scoring: normalize raw grading responses at scale,
then run the (tiny, driver-side) EM mutual-weighting.

Shape rationale: in a real evaluation run the EXPENSIVE part is the
N·N·M table of free-text grading responses (every grader × every graded
llm × every question — millions of rows for a big exam) — normalizing
those strings is an Arrow-batched distributed pass over the MoneyParser
kernel.  The EM itself consumes the (N, N, M) matrix of floats: N llms
is tens at most, so the matrix is KB-sized and the reference's
sequential-epoch algorithm (kernels/mellm.py) runs on the driver — a
driver collect of the AGGREGATED matrix, not of a corpus.

The network stage (calling llm APIs to produce the grading responses) is
the stub boundary: this module starts FROM the response table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from jionlp_spark.functions.ndet import ndet as _ndet


def normalize_grades(grades: DataFrame,
                     text_col: str = 'grade_text') -> DataFrame:
    """+ (score double, valid boolean): '四点五 分' → 4.5; unparseable
    responses get score 0.0 / valid false (they feed
    grading_error_count — the run_whole contract for graders that
    answered nonsense)."""
    from pyspark.sql.functions import pandas_udf

    @_ndet
    @pandas_udf('score double, valid boolean')
    def norm(text: pd.Series) -> pd.DataFrame:
        from jionlp_spark.kernels.mellm import normalize_grading_score
        from jionlp_spark.kernels.money import MoneyParser
        mp = MoneyParser()
        scores, valid = [], []
        for t in text:
            try:
                scores.append(normalize_grading_score(t, mp))
                valid.append(True)
            except ValueError:
                scores.append(0.0)
                valid.append(False)
        return pd.DataFrame({'score': scores, 'valid': valid})

    n = norm(F.col(text_col))
    return grades.withColumn('score', n['score']) \
                 .withColumn('valid', n['valid'])


def mutual_evaluation(spark: SparkSession, grades: DataFrame,
                      mode: str = 'whole',
                      grader_col: str = 'grader',
                      graded_col: str = 'graded',
                      question_col: str = 'question_idx',
                      text_col: str = 'grade_text',
                      max_epoch: int = 20) -> DataFrame:
    """grades(grader, graded, question_idx, grade_text) → per-llm
    (llm, total_score, weight, variance, epochs).

    Distributed normalization → driver-side EM (see module docstring).
    llm order = lexicographic on the name (deterministic)."""
    from jionlp_spark.kernels.mellm import run_singular, run_whole

    normed = normalize_grades(grades, text_col).select(
        F.col(grader_col).alias('grader'),
        F.col(graded_col).alias('graded'),
        F.col(question_col).cast('int').alias('q'),
        'score', 'valid')
    # Arrow transfer, not Row objects: the matrix is KB-sized but the raw
    # row set can be millions of entries for a big exam — toPandas keeps
    # the driver copy near the columnar payload size
    pdf = normed.toPandas()

    schema = ('llm string, total_score double, weight double, '
              'variance double, epochs int')
    if len(pdf) == 0:
        return spark.createDataFrame([], schema)
    # duplicate (grader, graded, question) keys would resolve
    # last-write-wins in whatever row order toPandas produced —
    # silently nondeterministic scores.  Reject malformed input instead.
    dup = pdf.duplicated(subset=['grader', 'graded', 'q'])
    if dup.any():
        first = pdf[dup].iloc[0]
        raise ValueError(
            'duplicate grading rows for (grader=%r, graded=%r, '
            'question_idx=%r) — one grade per (grader, graded, question) '
            'required' % (first['grader'], first['graded'], int(first['q'])))

    names = sorted(set(pdf['grader']) | set(pdf['graded']))
    idx = {n: i for i, n in enumerate(names)}
    n = len(names)
    m = int(pdf['q'].max()) + 1
    g = np.zeros((n, n, m))
    errs = np.zeros(n)
    gi = pdf['grader'].map(idx).to_numpy()
    gj = pdf['graded'].map(idx).to_numpy()
    gq = pdf['q'].to_numpy()
    valid = pdf['valid'].to_numpy()
    g[gi[valid], gj[valid], gq[valid]] = pdf['score'].to_numpy()[valid]
    np.add.at(errs, gi[~valid], 1)

    fn = run_whole if mode == 'whole' else run_singular
    res = fn(g, errs, max_epoch=max_epoch)
    out = [(name,
            float(round(res['total_score'][i], 6)),
            float(round(res['weight'][i], 6)),
            float(round(res['variance'][i], 6)),
            int(res['epochs']))
           for i, name in enumerate(names)]
    return spark.createDataFrame(out, schema)
