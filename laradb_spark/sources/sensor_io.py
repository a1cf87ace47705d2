"""Array-of-Things sensor CSV ingestion — the reference's raw-file entry
point for the flagship covariance benchmark.

Reference: ``sensor/SensorFileAction.kt:163-190`` parses semicolon lines
``date;node;class;family;value;unit`` (sample:
``2017-02-06 11:27:44.976000;coresense:3;TSYS01;temperature;8.22;NO_UNIT``)
into ``(t: Long epoch-ms UTC, c: String, v: Double)`` rows with rules:

  * lines with fewer than 6 fields are skipped;
  * ``class == 'Chemsense ID' && family == 'mac_address'`` rows are skipped
    (hex-string values, SensorFileAction.kt:174);
  * ``c = class + ';' + family`` (SensorFileAction.kt:179);
  * unparsable values are skipped (``toDoubleOrNull``, :180);
  * dates parse in UTC, with or without a fractional part
    (SensorFileAction.kt:17-18).

Fractional-seconds caveat: the reference parses ``.976000`` with lenient
``SimpleDateFormat("...ss.SSS")``, which reads the whole 6-digit run as an
integer MILLISECOND count — +976 s, overflowing into minutes
(SensorFileAction.kt:17,176-177). Default here is the correct reading
(976000 µs → 976 ms); pass ``legacy_fraction_ms=True`` to replicate the
reference bit-for-bit when cross-checking against its stored tables.

Spark mapping: one distributed CSV scan (quoting disabled — the reference
splits raw lines), pure Column expressions, no UDF; filters sit directly
on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SENSOR_CSV_SCHEMA = (
    "date STRING, node STRING, class STRING, family STRING, value STRING, unit STRING"
)


def read_sensor_csv(
    spark: SparkSession, path: str, legacy_fraction_ms: bool = False
) -> DataFrame:
    """Raw AoT sensor file(s) → ``(t: long epoch-ms, c: string, v: double)``
    frame, ready for ``sensor_covariance_pipeline``."""
    raw = (
        spark.read.schema(SENSOR_CSV_SCHEMA)
        .option("delimiter", ";")
        .option("quote", "")  # reference splits raw lines, no quoting
        .csv(path)
    )
    ok = raw.filter(
        F.col("date").isNotNull()
        & F.col("class").isNotNull()
        & F.col("family").isNotNull()
        & F.col("unit").isNotNull()  # <6 fields ⇒ trailing cols null
        & ~((F.col("class") == "Chemsense ID") & (F.col("family") == "mac_address"))
    )

    # try_* variants everywhere: the reference's contract is skip-bad-rows
    # (dateParser failure / toDoubleOrNull), and ANSI mode would error out.
    base = F.unix_millis(
        F.try_to_timestamp(
            F.substring_index(F.col("date"), ".", 1), F.lit("yyyy-MM-dd HH:mm:ss")
        )
    )
    frac_digits = F.when(
        F.col("date").contains("."), F.substring_index(F.col("date"), ".", -1)
    ).otherwise(F.lit("0"))
    if legacy_fraction_ms:
        # reference behavior: fraction digits taken as a whole-millisecond
        # count, however many digits there are
        t = base + frac_digits.try_cast("long")
    else:
        # correct behavior: fraction of a second — right-pad to 6 digits
        # (microseconds), floor to milliseconds
        micros = F.rpad(frac_digits, 6, "0").try_cast("long")
        t = base + F.floor(micros / F.lit(1000)).cast("long")

    out = ok.select(
        t.alias("t"),
        F.concat_ws(";", F.col("class"), F.col("family")).alias("c"),
        F.col("value").try_cast("double").alias("v"),
    ).filter(F.col("t").isNotNull() & F.col("v").isNotNull())
    return out


def sensor_covariance_from_files(
    spark: SparkSession,
    path_a: str,
    path_b: str,
    bin_ms: int | None = None,
    **kwargs,
) -> DataFrame:
    """The reference's full benchmark from raw files: parse both sensor
    files and run the covariance pipeline (reference: sensor/SensorCalc.kt:
    119-143 driven from ingested CSVs, sensor/SensorFileAction.kt)."""
    from ..sensor import DEFAULT_BIN_MS, sensor_covariance_pipeline

    a = read_sensor_csv(spark, path_a)
    b = read_sensor_csv(spark, path_b)
    return sensor_covariance_pipeline(
        a, b, bin_ms=bin_ms if bin_ms is not None else DEFAULT_BIN_MS, **kwargs
    )
