"""Iceberg-style table layer over Parquet with lineage manifests and
checkpoint-resumable stage boundaries (north_rule requirement).

No Iceberg runtime jar ships in this sandbox, so the catalog degrades to
partitioned Parquet + a ``_manifest.json`` snapshot per table: row count,
schema, per-file lineage (name, bytes), input fingerprint, and the stage
name.  The layout (table dir + manifest + partition spec) is Iceberg-shaped
so a real cluster can swap in a real catalog without touching the stages.

``run_stage`` is the resume point: if a stage's manifest is present and its
input fingerprint matches, the stage is skipped and its output read back;
otherwise it is (re)computed and atomically published (write to tmp dir →
rename).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

MANIFEST = '_manifest.json'


def _file_lineage(path: str) -> list:
    out = []
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if fn.endswith('.parquet'):
                fp = os.path.join(root, fn)
                out.append({'file': os.path.relpath(fp, path),
                            'bytes': os.path.getsize(fp)})
    return out


def write_manifest(path: str, stage: str, rows: int, schema_json: str,
                   input_fingerprint: str | None = None,
                   metrics: dict | None = None) -> dict:
    manifest = {
        'stage': stage,
        'rows': rows,
        'schema': json.loads(schema_json),
        'input_fingerprint': input_fingerprint,
        'files': _file_lineage(path),
        'metrics': metrics or {},
        'format_version': 1,
    }
    with open(os.path.join(path, MANIFEST), 'w', encoding='utf-8') as f:
        json.dump(manifest, f, ensure_ascii=False, indent=1)
    return manifest


def read_manifest(path: str) -> dict | None:
    mf = os.path.join(path, MANIFEST)
    if not os.path.exists(mf):
        return None
    with open(mf, encoding='utf-8') as f:
        return json.load(f)


def is_complete(path: str, input_fingerprint: str | None = None) -> bool:
    m = read_manifest(path)
    if m is None:
        return False
    if input_fingerprint is not None and \
            m.get('input_fingerprint') != input_fingerprint:
        return False
    return True


def run_stage(spark: SparkSession, path: str, stage: str, build,
              input_fingerprint: str | None = None,
              partition_by: tuple = (),
              resume: bool = True) -> DataFrame:
    """Execute (or resume) one checkpointed stage.

    ``build`` is a zero-arg callable returning the stage's output DataFrame.
    Publication is atomic: compute into ``path + '.tmp'``, then rename.
    """
    if resume and is_complete(path, input_fingerprint):
        return spark.read.parquet(path)

    df = build()
    tmp = path + '.tmp'
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    writer = df.write.mode('overwrite')
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)

    out = spark.read.parquet(tmp)
    rows = out.count()
    write_manifest(tmp, stage, rows, out.schema.json(), input_fingerprint)

    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return spark.read.parquet(path)


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str,
                   n_buckets: int = 32, sort_col: str | None = None) -> None:
    """Publish a table bucketed (and optionally sorted) by a join key —
    repeated joins/aggregations on that key then run exchange-free
    (sort-merge join reads co-located buckets; no shuffle at query time).
    The 100 TB use case: the mentions and triples tables are re-joined on
    url/doc keys by every downstream consumer, so paying one bucketed write
    amortizes the shuffle across all of them.

    Uses the session warehouse (saveAsTable — bucketing metadata lives in
    the catalog, plain parquet paths can't carry it).
    """
    w = df.write.format('parquet').mode('overwrite') \
        .bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)
