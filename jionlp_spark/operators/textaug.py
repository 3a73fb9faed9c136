"""Distributed text augmentation over a document table.

Wraps the kernels in jionlp_spark.kernels.textaug with per-document seeded
RNGs: the reference consumes the GLOBAL numpy RNG (nondeterministic under
any parallelism); here each row gets ``numpy.random.RandomState(base_seed +
doc_id)``, whose Mersenne stream is identical to the reference's
``np.random.seed(s)`` — so results are reproducible, shuffle-order
independent, and still bit-equal to the single-threaded reference for the
same per-row seed (asserted by tests/test_textaug.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from jionlp_spark.functions.ndet import ndet as _ndet


def augment_swap(docs: DataFrame, augmentation_num: int = 3,
                 swap_ratio: float = 0.02, scale: float = 1.0,
                 base_seed: int = 0, text_col: str = 'text',
                 id_col: str = 'doc_id', seed_col: str | None = None,
                 sep: str = '|') -> DataFrame:
    """→ (doc_id, text, augmented) with `sep`-joined swap augmentations.
    The RNG seed per row is base_seed + `seed_col` (default: the id)."""
    from pyspark.sql.functions import pandas_udf

    @_ndet
    @pandas_udf('string')
    def swap_udf(seed: pd.Series, text: pd.Series) -> pd.Series:
        import numpy as np

        from jionlp_spark.kernels.textaug import SwapCharPosition

        def one(s, t):
            aug = SwapCharPosition(
                swap_ratio=swap_ratio, scale=scale,
                rng=np.random.RandomState(base_seed + int(s)))
            return sep.join(aug(t, augmentation_num=augmentation_num))
        return pd.Series([one(s, t) for s, t in zip(seed, text)])

    return docs.select(F.col(id_col).alias('doc_id'),
                       F.col(text_col).alias('text'),
                       swap_udf(F.col(seed_col or id_col), F.col(text_col))
                       .alias('augmented'))


def augment_add_delete(docs: DataFrame, augmentation_num: int = 3,
                       add_ratio: float = 0.02, delete_ratio: float = 0.02,
                       base_seed: int = 0, text_col: str = 'text',
                       id_col: str = 'doc_id', sep: str = '|') -> DataFrame:
    """→ (doc_id, text, augmented) with add/delete augmentations.  The
    smoothed char distribution is built once per Python worker (module
    singleton in the kernel layer, ~400 KB)."""
    from pyspark.sql.functions import pandas_udf

    @_ndet
    @pandas_udf('string')
    def ad_udf(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        import numpy as np

        from jionlp_spark import lexicons
        from jionlp_spark.kernels.textaug import RandomAddDelete
        dist = lexicons.load_char_distribution()

        def one(did, t):
            aug = RandomAddDelete(
                dist, add_ratio=add_ratio, delete_ratio=delete_ratio,
                rng=np.random.RandomState(base_seed + int(did)))
            return sep.join(aug(t, augmentation_num=augmentation_num))
        return pd.Series([one(d, t) for d, t in zip(doc_id, text)])

    return docs.select(F.col(id_col).alias('doc_id'),
                       F.col(text_col).alias('text'),
                       ad_udf(F.col(id_col), F.col(text_col))
                       .alias('augmented'))


_HOMOPHONE_SINGLETON: list = []


def _get_homophone():
    """Per-Python-worker singleton: the augmenter's static state (FMM trie
    over the 193k-word vocabulary, pinyin map, homophone replacement dict)
    builds once per worker; per-document RNGs are swapped in per row.
    Measured footprint: ~145 MB steady per worker (~260 MB build peak
    incl. the transient row list) — size executor memory for
    workers × 150 MB when this operator is in the job.  At cluster scale
    prefer shipping the vendored tsv via --py-files (it already lives
    inside the package) so workers build locally instead of broadcasting
    the built trie."""
    if not _HOMOPHONE_SINGLETON:
        import numpy as np

        from jionlp_spark import lexicons
        from jionlp_spark.kernels.chartext import Pinyin
        from jionlp_spark.kernels.homophone import HomophoneSubstitution
        wd = lexicons.load_word_distribution_raw()
        phrase, pchar, _rad = lexicons.load_char_info()
        _HOMOPHONE_SINGLETON.append(
            HomophoneSubstitution(wd, rng=np.random.RandomState(0),
                                  pinyin=Pinyin(phrase, pchar)))
    return _HOMOPHONE_SINGLETON[0]


def augment_homophone(docs: DataFrame, augmentation_num: int = 3,
                      homo_ratio: float = 0.02,
                      allow_mispronounce: bool = True,
                      base_seed: int = 0, text_col: str = 'text',
                      id_col: str = 'doc_id', seed_col: str | None = None,
                      sep: str = '|') -> DataFrame:
    """→ (doc_id, text, augmented) with homophone-substitution
    augmentations (kernels/homophone.py — reference algorithm with FMM
    segmentation).  RNG per row = RandomState(base_seed + seed_col)."""
    from pyspark.sql.functions import pandas_udf

    @_ndet
    @pandas_udf('string')
    def homo_udf(seed: pd.Series, text: pd.Series) -> pd.Series:
        import numpy as np
        aug = _get_homophone()

        def one(s, t):
            aug.rng = np.random.RandomState(base_seed + int(s))
            aug.homo_ratio = homo_ratio
            return sep.join(aug(t, augmentation_num=augmentation_num,
                                allow_mispronounce=allow_mispronounce))
        return pd.Series([one(s, t) for s, t in zip(seed, text)])

    return docs.select(F.col(id_col).alias('doc_id'),
                       F.col(text_col).alias('text'),
                       homo_udf(F.col(seed_col or id_col), F.col(text_col))
                       .alias('augmented'))


def augment_back_translation(docs: DataFrame, apis=None,
                             text_col: str = 'text',
                             id_col: str = 'doc_id',
                             sep: str = '|') -> DataFrame:
    """→ (doc_id, text, augmented) via the back-translation orchestrator
    (kernels/backtrans.py).  Default clients are the in-repo
    DeterministicFakeApi STUBS (no network in this sandbox); pass real
    translation_api-style clients for production — then each Arrow batch
    issues its rows' API calls from the executor, so size batches to the
    provider rate limit (spark.sql.execution.arrow.maxRecordsPerBatch)
    and keep per-doc language fan-out sequential (the reference's
    process-pool parallelism is replaced by row/partition parallelism).
    """
    from pyspark.sql.functions import pandas_udf

    @_ndet
    @pandas_udf('string')
    def bt_udf(text: pd.Series) -> pd.Series:
        from jionlp_spark.kernels.backtrans import (BackTranslation,
                                                    DeterministicFakeApi)
        clients = apis if apis is not None else \
            [DeterministicFakeApi('a'), DeterministicFakeApi('b')]
        bt = BackTranslation(clients)
        return pd.Series([sep.join(bt(t)) for t in text])

    return docs.select(F.col(id_col).alias('doc_id'),
                       F.col(text_col).alias('text'),
                       bt_udf(F.col(text_col)).alias('augmented'))
