"""Distributed external-tool stage (SURVEY §3.1 RUN_ARPEGGIO).

The reference shells out per structure with a hard timeout and treats
failures as logged rows, not exceptions:

- `nextflow/bin/run_arpeggio.sh:11` — `timeout -k 10 6h pdbe-arpeggio`
- `nextflow/main.nf:45` — exit codes 124-127 ignored (dead-letter)
- `nextflow/bin/process_pdb_structure.py:195-209` — top-decile heaviest
  structures isolated as single jobs, the rest chunked ×100

Spark mapping: the binary runs inside ``mapInPandas`` workers (one
subprocess per input row, Arrow-batched rows around it), the timeout is
enforced per invocation with a kill grace, and every outcome — success,
timeout, nonzero exit — comes back as a ROW with a status column, so a
flaky tool never kills a 100 TB job. Load balancing replaces the
reference's manual molwt split with a cost-aware repartition.

The arpeggio binary itself is absent in this container; tests drive the
operator with stub commands (`sh -c ...`) — the Spark-side plumbing
(batching, timeout, dead-letter schema, partitioning) is real.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# dead-letter statuses mirror the reference's exit-code contract
# (process_pdb_structure.py:154-163: 120-127 = malformed/oversized/
# no-bound-entities/...; run_arpeggio.sh timeout → 124)
STATUS_OK = "ok"
STATUS_TIMEOUT = "timeout"


def run_external_tool(
    df: DataFrame,
    *,
    argv: list[str],
    input_col: str,
    timeout_s: float = 6 * 3600,
    kill_grace_s: float = 10.0,
    output_col: str = "tool_stdout",
) -> DataFrame:
    """Run ``argv`` once per row, substituting ``"{}"`` arguments with the
    row's ``input_col`` value. Appends (exit_code, status, output_col);
    never raises for tool failures — timeout rows carry exit_code 124 /
    status 'timeout' (the `timeout(1)` convention the reference relies
    on), other nonzero exits carry status 'error_<code>'.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("exit_code", T.IntegerType()),
            T.StructField("status", T.StringType()),
            T.StructField(output_col, T.StringType()),
        ]
    )

    def run_batches(batches: Iterator) -> Iterator:
        import subprocess

        import pandas as pd

        for pdf in batches:
            codes, statuses, outs = [], [], []
            for val in pdf[input_col].astype(str):
                cmd = [val if a == "{}" else a for a in argv]
                try:
                    proc = subprocess.Popen(
                        cmd,
                        stdout=subprocess.PIPE,
                        stderr=subprocess.DEVNULL,
                        text=True,
                    )
                    try:
                        out, _ = proc.communicate(timeout=timeout_s)
                        code = proc.returncode
                    except subprocess.TimeoutExpired:
                        proc.kill()
                        try:
                            proc.communicate(timeout=kill_grace_s)
                        except subprocess.TimeoutExpired:
                            pass
                        code, out = 124, None
                except OSError as exc:  # binary missing/unrunnable
                    code, out = 127, str(exc)
                codes.append(code)
                statuses.append(
                    STATUS_OK
                    if code == 0
                    else (STATUS_TIMEOUT if code == 124 else f"error_{code}")
                )
                outs.append(out.rstrip("\n") if out is not None else None)
            out_pdf = pdf.copy()
            out_pdf["exit_code"] = pd.array(codes, dtype="int32")
            out_pdf["status"] = statuses
            out_pdf[output_col] = outs
            yield out_pdf

    return df.mapInPandas(run_batches, schema=out_schema)


def cost_balanced_repartition(
    df: DataFrame,
    *,
    cost_col: str,
    id_col: str,
    num_partitions: int,
    heavy_quantile: float = 0.8,
) -> DataFrame:
    """The reference's load-balancing split (top decile of structures by
    molwt run as singleton jobs, the rest chunked ×100 —
    `process_pdb_structure.py:195-209`) as a partitioning policy: rows
    above the ``heavy_quantile`` cost threshold hash-spread by their
    unique id (each heavy row lands independently, so no partition
    collects the heavy tail), light rows stay in normal hash buckets.
    The threshold is computed distributively (percentile_approx) and
    broadcast — no driver collect of data rows.
    """
    thresh = F.broadcast(
        df.agg(
            F.percentile_approx(F.col(cost_col), heavy_quantile).alias("_thresh")
        )
    )
    keyed = df.crossJoin(thresh).withColumn(
        "_pkey",
        F.when(
            F.col(cost_col) >= F.col("_thresh"),
            F.concat(F.lit("heavy:"), F.col(id_col).cast("string")),
        ).otherwise(
            F.concat(
                F.lit("light:"),
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_partitions)).cast("string"),
            )
        ),
    )
    return keyed.repartition(num_partitions, "_pkey").drop("_pkey", "_thresh")
