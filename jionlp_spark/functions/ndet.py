"""Non-deterministic marking for expensive UDFs (optimization guide §4.4).

A filter that references a UDF-computed column (e.g. the bench harness's
digest force, or any caller filtering on a scored output) gets pushed below
the projection by Catalyst, which re-evaluates the UDF once below the
filter and once above — every row pays the Python boundary twice.  Marking
the UDF non-deterministic forbids that duplication (and the reorder): one
ArrowEvalPython node per stage.  Results are unchanged — our UDFs ARE
deterministic; the flag only constrains the optimizer.
"""

from __future__ import annotations


def ndet(udf):
    return udf.asNondeterministic()
