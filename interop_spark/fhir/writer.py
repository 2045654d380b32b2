"""Reverse path: relational rows → FHIR bundle JSON (one bundle per row).

Reference surface (`01_dbignite_sample.py:495-602`):

    maps = [Mapping('DESYNPUF_ID', 'Patient.id'),
            Mapping('BENE_BIRTH_DT', 'Patient.birthDate'),
            Mapping('BENE_COUNTY_CD', 'Patient.address.postalCode'),
            Mapping('CLM_ID', 'Claim.id'),
            Mapping('HCPCS_CD_1', 'Claim.procedure.procedureCodeableConcept.coding.code'),
            ...]
    em = FhirEncoderManager(override_encoders={
        'Claim.procedure.procedureCodeableConcept.coding':
            FhirEncoder(False, False, lambda x: [
                {'code': c, 'system': 'http://.../HCPCS'} for c in x.split(',')])})
    m = MappingManager(maps, df.schema, em)
    result = Bundle(m).df_to_fhir(df)        # RDD[str] of bundle JSON

Spark-first compilation (SURVEY.md §3 EP3): the mapping list compiles to a
single pure-Column expression tree — nested ``struct()``/``array()`` builds
ending in one ``to_json`` — so rows never leave the JVM. Only user-supplied
``FhirEncoder`` lambdas fall back to a Python UDF, and that UDF is scoped to
exactly the affected path: it emits a JSON fragment that re-enters the plan
as a VARIANT (``parse_json``), which ``to_json`` splices verbatim. At 100 TB
the encoder cost is proportional to the overridden columns, not the row.

Semantics for repeated elements:
- path segments that are repeated in FHIR R4 (``address``, ``procedure``,
  ``coding``, …) become arrays;
- N sources mapping to the same path fan out at the OUTERMOST repeated
  segment — e.g. HCPCS_CD_1/2 → two ``procedure`` entries
  (`01_dbignite_sample.py:524-525,527-528`);
- an encoder returning a list expands in place at its keyed path
  (`:534-539`).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

# FHIR R4 elements with cardinality 0..* among the paths this engine maps
# (public R4 structure knowledge).
REPEATED_SEGMENTS = frozenset(
    {
        "identifier", "name", "telecom", "address", "given", "prefix",
        "suffix", "line", "coding", "extension", "procedure", "diagnosis",
        "item", "insurance", "entry", "payor", "class", "communication",
        "contact", "link", "focus", "destination", "category", "participant",
        "location", "reasonCode", "account", "subject_list", "qualification",
    }
)


@dataclass
class Mapping:
    """Declare ``src column → FHIR path`` (`01_dbignite_sample.py:520-529`)."""

    src: str
    fhir_path: str

    @property
    def resource_type(self) -> str:
        return self.fhir_path.split(".")[0]


@dataclass
class FhirEncoder:
    """Per-path custom serializer (`01_dbignite_sample.py:532-539`).

    ``f`` is a Python lambda taking the raw source cell and returning any
    JSON-encodable value (scalar, dict, or list — lists expand in place).
    ``one_to_one`` / ``src_like_tgt`` are carried for API parity with the
    reference's constructor signature.
    """

    one_to_one: bool = True
    src_like_tgt: bool = False
    f: object = None
    default: str = ""

    def to_udf(self):
        # capture plain locals only: referencing `self` would make
        # cloudpickle serialize FhirEncoder by module reference, requiring
        # interop_spark to be importable on every executor
        func = self.f
        default = self.default

        def _encode(v):
            if v is None:
                return None
            try:
                return json.dumps(func(v))
            except Exception:
                return json.dumps(default)

        return F.udf(_encode, StringType())


@dataclass
class FhirEncoderManager:
    """Registry of path-keyed encoder overrides (`01_dbignite_sample.py:531-539`)."""

    override_encoders: dict[str, FhirEncoder] = field(default_factory=dict)

    def get_encoder(self, path: str) -> FhirEncoder | None:
        return self.override_encoders.get(path)


class MappingManager:
    """Bind mappings to a source schema (`01_dbignite_sample.py:540`):
    validates every src column exists and groups paths per resource."""

    def __init__(
        self,
        mappings: list[Mapping],
        src_schema: StructType,
        encoder_manager: FhirEncoderManager | None = None,
    ):
        self.mappings = list(mappings)
        self.src_schema = src_schema
        self.encoder_manager = encoder_manager or FhirEncoderManager()
        names = set(src_schema.fieldNames())
        missing = [m.src for m in self.mappings if m.src not in names]
        if missing:
            raise ValueError(
                f"mapping source columns not in DataFrame schema: {missing}"
            )

    def by_resource(self) -> dict[str, list[Mapping]]:
        out: dict[str, list[Mapping]] = {}
        for m in self.mappings:
            out.setdefault(m.resource_type, []).append(m)
        return out


# ---------------------------------------------------------------------------
# Compilation: mapping tree → Column expression
# ---------------------------------------------------------------------------


class _Node:
    def __init__(self):
        self.children: dict[str, _Node] = {}
        self.sources: list[str] = []  # leaf source columns, in mapping order

    def insert(self, segments: list[str], src: str) -> None:
        if not segments:
            self.sources.append(src)
            return
        self.children.setdefault(segments[0], _Node()).insert(segments[1:], src)

    def multi_fanout(self) -> int:
        """Max number of parallel sources anywhere under this node."""
        n = max(len(self.sources), 1)
        for c in self.children.values():
            n = max(n, c.multi_fanout())
        return n


def _leaf_value(src: str) -> Column:
    # FHIR primitives on the demo paths are strings (id, date, postalCode,
    # codes); cast keeps e.g. bigint CLM_ID valid as a FHIR id.
    return F.col(src).cast("string")


def _render(
    node: _Node,
    path: str,
    em: FhirEncoderManager,
    pick: int | None,
) -> Column | None:
    """Render the subtree at ``path`` to a Column.

    ``pick`` selects which parallel source a multi-source leaf should use
    (fan-out index fixed by the outermost repeated ancestor); None = not
    under a fan-out yet.
    """
    enc = em.get_encoder(path)
    if enc is not None and enc.f is not None:
        # scoped UDF: encode the (single) source feeding this subtree and
        # splice its JSON output in as a VARIANT
        srcs = _collect_sources(node)
        src = srcs[pick if pick is not None and pick < len(srcs) else 0]
        return F.parse_json(enc.to_udf()(F.col(src)))

    if node.sources:
        srcs = node.sources
        if pick is not None:
            src = srcs[pick] if pick < len(srcs) else None
            return _leaf_value(src) if src is not None else None
        if len(srcs) == 1:
            return _leaf_value(srcs[0])
        # several sources, no repeated ancestor: emit an array of values
        return F.array(*[_leaf_value(s) for s in srcs])

    fields = []
    for seg, child in node.children.items():
        seg_path = f"{path}.{seg}" if path else seg
        if seg in REPEATED_SEGMENTS:
            child_enc = em.get_encoder(seg_path)
            if child_enc is not None and child_enc.f is not None:
                val = _render(child, seg_path, em, pick)
            elif pick is None and child.multi_fanout() > 1:
                # outermost repeated segment under a multi-source path:
                # fan out one element per source; elements whose sources
                # are all NULL are dropped (a NULL HCPCS_CD_2 must not
                # become an empty procedure entry)
                elems = []
                for i in range(child.multi_fanout()):
                    e = _render(child, seg_path, em, i)
                    if e is not None:
                        elems.append(
                            F.when(_any_source_set(child, i), e)
                        )
                val = (
                    F.array_compact(F.array(*elems)) if elems else None
                )
            else:
                inner = _render(child, seg_path, em, pick)
                val = F.array(inner) if inner is not None else None
        else:
            val = _render(child, seg_path, em, pick)
        if val is not None:
            fields.append(val.alias(seg))
    if not fields:
        return None
    return F.struct(*fields)


def _any_source_set(node: _Node, pick: int) -> Column:
    """True when any source feeding fan-out element ``pick`` is non-null."""
    cond = F.lit(False)
    for s in _sources_for_pick(node, pick):
        cond = cond | F.col(s).isNotNull()
    return cond


def _sources_for_pick(node: _Node, pick: int) -> list[str]:
    out = []
    if node.sources:
        if len(node.sources) > pick:
            out.append(node.sources[pick])
        elif len(node.sources) == 1:
            out.append(node.sources[0])
    for c in node.children.values():
        out.extend(_sources_for_pick(c, pick))
    return out


def _collect_sources(node: _Node) -> list[str]:
    out = list(node.sources)
    for c in node.children.values():
        out.extend(_collect_sources(c))
    return out


class Bundle:
    """Compile a MappingManager and emit FHIR bundle JSON per input row
    (`01_dbignite_sample.py:541-542`)."""

    def __init__(self, mapping_manager: MappingManager):
        self.mm = mapping_manager

    def _bundle_column(self) -> Column:
        em = self.mm.encoder_manager
        entries = []
        for rt, maps in self.mm.by_resource().items():
            root = _Node()
            for m in maps:
                segs = m.fhir_path.split(".")[1:]
                root.insert(segs, m.src)
            body = _render(root, rt, em, None)
            resource_fields = [F.lit(rt).alias("resourceType")]
            if body is not None:
                # body is a struct; splice its fields beside resourceType
                for seg, child in root.children.items():
                    resource_fields.append(body.getField(seg).alias(seg))
            entry_struct = F.struct(F.struct(*resource_fields).alias("resource"))
            # bundle entries are heterogeneous (Patient struct ≠ Claim
            # struct) but Spark arrays are homogeneous — normalize each
            # entry to VARIANT (JVM-side to_json→parse_json, no Python)
            entries.append(F.parse_json(F.to_json(entry_struct)))
        return F.to_json(
            F.struct(
                F.lit("Bundle").alias("resourceType"),
                F.lit("collection").alias("type"),
                F.array(*entries).alias("entry"),
            )
        )

    def df_to_fhir_df(self, df: DataFrame) -> DataFrame:
        """DataFrame[value: string] of bundle JSON — the native form."""
        return df.select(self._bundle_column().alias("value"))

    def df_to_fhir(self, df: DataFrame):
        """RDD[str] for API parity with the reference (`:542,547-548`)."""
        return self.df_to_fhir_df(df).rdd.map(lambda r: r[0])
