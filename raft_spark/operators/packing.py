"""Sequence packing for LLM pretraining: assign documents to
fixed-token-budget packs (the concat-and-chunk step that turns a
deduplicated corpus into training sequences).

Global optimal bin packing is NP-hard and inherently sequential, so the
distributed contract is the standard one: first-fit-decreasing WITHIN
each partition (an Arrow-batched applyInPandas per salt group), with
pack ids namespaced by group so packs never span partitions. Waste is
bounded: FFD wastes < 1 bin per open bin, and partition-local packing
costs at most one partially-filled pack per partition — at 100 TB
(millions of packs per partition) the tail is noise, while the
alternative (a global sort + sequential scan) is a single-node
bottleneck by construction.

Documents longer than the budget are flagged (``truncated=1``) and
occupy a dedicated pack — splitting/overflow policy belongs to the
tokenizer stage, not the packer.

Determinism: salt = doc_id % n_groups, FFD order = (len desc, doc_id)
inside the group — independent of physical partitioning, so retries
and speculation reproduce identical packs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "doc_id long, pack_id long, n_tokens long, pack_slot int, truncated int"
)


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_groups: int = 64,
    len_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, pack_id, n_tokens, pack_slot, truncated).

    ``len_col`` gives token counts; defaults to whitespace tokens of
    ``text_col``. pack_id = group·2³² + local index (collision-free).
    """
    if len_col is None:
        lens = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.size(F.split(F.col(text_col), r"\s+")).cast("long").alias("n_tokens"),
        )
    else:
        lens = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(len_col).cast("long").alias("n_tokens"),
        )
    salted = lens.withColumn("_g", F.pmod(F.col("doc_id"), F.lit(n_groups)))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                columns=["doc_id", "pack_id", "n_tokens", "pack_slot", "truncated"]
            )
        g = int(pdf["_g"].iloc[0])
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        # first-fit-decreasing over open packs
        opens: list[list[int]] = []  # [remaining, local_pack_idx]
        rows = []
        next_idx = 0
        for doc_id, n in zip(pdf["doc_id"], pdf["n_tokens"]):
            n = int(n)
            truncated = int(n > budget)
            placed = None
            if not truncated:
                for o in opens:
                    if o[0] >= n:
                        placed = o
                        break
            if placed is None:
                idx = next_idx
                next_idx += 1
                rem = max(budget - n, 0) if not truncated else 0
                opens.append([rem, idx])
            else:
                placed[0] -= n
                idx = placed[1]
            rows.append((int(doc_id), idx, n, truncated))
        out = pd.DataFrame(rows, columns=["doc_id", "_local", "n_tokens", "truncated"])
        out["pack_slot"] = out.groupby("_local").cumcount().astype("int32")
        out["pack_id"] = (g << 32) + out["_local"]
        return out[["doc_id", "pack_id", "n_tokens", "pack_slot", "truncated"]]

    return (
        salted.repartition(min(n_groups, 64), "_g")
        .groupBy("_g")
        .applyInPandas(pack, OUT_SCHEMA)
    )
