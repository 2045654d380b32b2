"""Group-wise (block) int4 scalar quantization (round-15b) — the next
rung of the compression ladder below `similarity.sq8_encode`: 8x
smaller than float32 by storing 4-bit codes with PER-BLOCK min/scale
pairs. Blockwise scaling is what makes 4 bits survivable — one outlier
dimension only stretches its own block's range, not the whole vector's
(the public llama.cpp / QLoRA block-quantization idea; no code reused).

Pure higher-order-function expressions: encoding a 100 TB embedding
table is one scan, no shuffle, JVM-codegen end to end.

Parity discipline is `sq8_encode`'s: the quantizer quotient rounds to
0 decimals where Spark (BigDecimal HALF_UP on the shortest repr) and
DuckDB (round half away from zero) agree for every nonnegative double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

INT4_LEVELS = 15  # codes live in [0, 15]


def int4_encode(vec: Column, block: int = 8) -> Column:
    """Blockwise int4 quantization: array of per-block
    struct(mn, scale, codes) with ``code[i] = round((x[i] - mn_b) /
    scale_b)`` in [0, 15]; a constant block gets scale 0 and all-zero
    codes. A dimension ``block`` does not divide gets a final SHORT
    block (``F.slice`` clamps at the array end), so every element is
    encoded — trailing dimensions are never silently dropped (ADVICE
    r15) and ``int4_decode`` returns the full-length vector.

    Shape note: the slice happens in an OUTER transform whose lambda
    variable binds the block array — Catalyst expression trees have no
    let-binding, so referencing ``F.slice(...)`` inside the per-element
    lambda would re-slice (and re-scan for min/max) for EVERY code
    element; the nested-transform form evaluates each slice exactly
    once per block."""
    from interop_spark.operators.similarity import as_double

    v = as_double(vec)
    nblocks = F.ceil(F.size(v) / F.lit(block)).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(1), nblocks),
        lambda b: F.slice(v, (b - 1) * block + 1, block),
    )
    return F.transform(blocks, _encode_block)


def _encode_block(blk: Column) -> Column:
    mn = F.array_min(blk)
    scale = (F.array_max(blk) - mn) / F.lit(float(INT4_LEVELS))
    codes = F.transform(
        blk,
        lambda x: F.when(scale > 0, F.round((x - mn) / scale))
        .otherwise(F.lit(0.0))
        .cast("int"),
    )
    return F.struct(
        mn.alias("mn"), scale.alias("scale"), codes.alias("codes")
    )


def int4_decode(enc: Column) -> Column:
    """Dequantize a blockwise encoding back to one flat array<double>:
    ``x'[i] = mn_b + code[i] * scale_b``."""
    return F.flatten(
        F.transform(
            enc,
            lambda b: F.transform(
                b["codes"], lambda c: b["mn"] + c.cast("double") * b["scale"]
            ),
        )
    )
