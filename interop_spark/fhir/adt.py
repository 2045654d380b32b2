"""ADT (admit/discharge/transfer) event semantics.

The reference registers a ``get_action`` UDF as a side effect of
constructing ``ADTActions()`` (`01_dbignite_sample.py:410-414`) and uses it
as ``get_action(code).action / .description`` (`:440-441`).

Spark-first: instead of a row-at-a-time Python UDF, ``get_action`` is a
SQL scalar function compiled to a CASE expression over the static HL7 v2
ADT code table — it stays inside whole-stage codegen and is trivially
broadcastable. The code table itself is public HL7 v2 event vocabulary
(the four codes in the sample feed are ADT_A01/A09/A28/A31,
`sampledata/adt_records/*.json`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Public HL7 v2 ADT event codes → (action, description).
ADT_ACTIONS: dict[str, tuple[str, str]] = {
    "ADT_A01": ("admit", "admit a patient as an inpatient"),
    "ADT_A02": ("transfer", "transfer a patient between locations"),
    "ADT_A03": ("discharge", "discharge a patient / end a visit"),
    "ADT_A04": ("register", "register a patient for an outpatient visit"),
    "ADT_A05": ("pre-admit", "pre-admit a patient"),
    "ADT_A06": ("change to inpatient", "transfer an outpatient to inpatient"),
    "ADT_A07": ("change to outpatient", "transfer an inpatient to outpatient"),
    "ADT_A08": ("update patient info", "update patient information"),
    "ADT_A09": ("patient departing", "patient departing - tracking"),
    "ADT_A10": ("patient arriving", "patient arriving - tracking"),
    "ADT_A11": ("cancel admit", "cancel admit / visit notification"),
    "ADT_A12": ("cancel transfer", "cancel transfer"),
    "ADT_A13": ("cancel discharge", "cancel discharge / end visit"),
    "ADT_A28": ("add person info", "add person or patient information"),
    "ADT_A31": ("update person info", "update person or patient information"),
    "ADT_A40": ("merge patient", "merge patient identifier lists"),
    "ADT_A60": ("update allergy info", "update adverse reaction information"),
}


def _case_expr(field_index: int) -> str:
    whens = " ".join(
        f"WHEN '{code}' THEN '{vals[field_index]}'"
        for code, vals in ADT_ACTIONS.items()
    )
    return f"CASE code {whens} ELSE NULL END"


class ADTActions:
    """Constructing this registers the ``get_action`` SQL function
    (side-effect API parity with the reference, `01_dbignite_sample.py:414`)."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = (
            spark
            or SparkSession.getActiveSession()
            or SparkSession.builder.getOrCreate()
        )
        self.register(self.spark)

    @staticmethod
    def register(spark: SparkSession) -> None:
        """Register ``get_action(code) -> struct<action,description>`` as a
        SQL scalar function (pure CASE expression — codegen-friendly, no
        Python worker round trip)."""
        spark.sql(
            f"""
            CREATE OR REPLACE TEMPORARY FUNCTION get_action(code STRING)
            RETURNS STRUCT<action STRING, description STRING>
            RETURN named_struct(
                'action', {_case_expr(0)},
                'description', {_case_expr(1)}
            )
            """
        )

    @staticmethod
    def actions_df(spark: SparkSession) -> DataFrame:
        """The code table as a broadcastable dimension DataFrame — the
        join-based alternative when enriching at scale."""
        rows = [(c, a, d) for c, (a, d) in ADT_ACTIONS.items()]
        return spark.createDataFrame(rows, "code string, action string, description string")


def get_action(code_col) -> "F.Column":
    """Column-level form: ``get_action(col)`` → struct<action, description>
    without requiring the SQL function registration."""
    action = F.lit(None).cast("string")
    desc = F.lit(None).cast("string")
    for code, (a, d) in reversed(list(ADT_ACTIONS.items())):
        action = F.when(code_col == code, F.lit(a)).otherwise(action)
        desc = F.when(code_col == code, F.lit(d)).otherwise(desc)
    return F.struct(action.alias("action"), desc.alias("description"))
