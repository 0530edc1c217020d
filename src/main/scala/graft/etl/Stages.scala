package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Quality-stage counters, defined exactly as the reference's sequential
  * count deltas (`/root/reference/src/etl_entregas.py:127-170`): each
  * counter is "rows removed by this filter given everything before it ran".
  * The engine computes them in a single aggregate pass over the input plus
  * one distinct-count — two jobs total instead of the reference's ~10
  * full rescans — but the values are identical by construction.
  */
final case class QualityMetrics(
    inputRows: Long,
    removedNullMaterial: Long,
    removedInvalidType: Long,
    removedDuplicates: Long,
    removedInvalidCountry: Long) {
  def outputRows: Long =
    inputRows - removedNullMaterial - removedInvalidType - removedDuplicates -
      removedInvalidCountry
}

/** S1/S2 — CSV source (`/root/reference/src/etl_entregas.py:92-111`).
  * RFC-4180 embedded quotes: quote `"`, escape `"`.
  */
object Extract {
  def apply(spark: SparkSession, inputFile: String): DataFrame =
    spark.read
      .schema(Schemas.raw)
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(inputFile)
}

/** F1–F4 — data-quality filters (`/root/reference/src/etl_entregas.py:127-170`).
  * Pure `DataFrame => DataFrame`; the metric computation is a separate
  * method so callers that don't need counters pay zero extra jobs.
  */
object DataQuality {

  def materialOk: Column = col("material").isNotNull && trim(col("material")) =!= ""
  def typeOk(validTypes: Seq[String]): Column = col("tipo_entrega").isin(validTypes: _*)
  def countryOk(validCountries: Seq[String]): Column =
    upper(col("pais")).isin(validCountries: _*)

  def apply(df: DataFrame, cfg: EtlConfig): DataFrame = {
    val dq = cfg.dataQuality
    var out = df
    if (dq.removeNullMaterial) out = out.filter(materialOk)
    out = out.filter(typeOk(cfg.businessRules.validTypes))
    if (dq.removeDuplicates) out = out.dropDuplicates()
    if (dq.validateCountryCodes) out = out.filter(countryOk(dq.validCountries))
    out
  }

  /** Sequential-delta counters in ONE aggregate job (r18; previously one
    * aggregate pass + a separate dedup-count job). Order matters: the
    * null-material filter runs before the type whitelist, so a row
    * failing both counts against null-material only (same double-count
    * semantics as the reference's eager counts).
    *
    * The dedup layers ride the same aggregate as exact
    * `count(DISTINCT when(pred, struct(*)))` cells: the struct is null
    * unless the row survives the preceding filters, so the distinct
    * count equals `filter(pred).dropDuplicates().count()` exactly
    * (distinct-then-filter ≡ filter-then-distinct for a row-local
    * predicate, and both group null fields null-safely). Every
    * `sum(...)` is coalesced to 0 — over an empty relation sum() is
    * NULL and getLong would NPE (the r17 empty-input edge). Trade-off,
    * noted for scale: the two distinct cells plan through one Expand
    * (×3 row multiplier before the exchange), which is the standard
    * Spark shape for mixed distinct aggregates — the same full-row
    * shuffle the dropDuplicates variant paid, one job instead of two.
    */
  def metrics(df: DataFrame, cfg: EtlConfig): QualityMetrics = {
    val dq = cfg.dataQuality
    val f1 = if (dq.removeNullMaterial) materialOk else lit(true)
    val f2 = typeOk(cfg.businessRules.validTypes)
    val f4 = if (dq.validateCountryCodes) countryOk(dq.validCountries) else lit(true)
    def cnt(pred: Column): Column = coalesce(
      sum(when(pred, 1L).otherwise(0L)), lit(0L))
    val allCols = struct(df.columns.map(col): _*)

    val aggs = Seq(
      count(lit(1)).as("n_input"),
      cnt(!f1).as("n_f1_removed"),
      cnt(f1 && !f2).as("n_f2_removed"),
      cnt(f1 && f2).as("n_after_f2")) ++
      (if (dq.removeDuplicates)
        Seq(countDistinct(when(f1 && f2, allCols)).as("n_distinct"),
          countDistinct(when(f1 && f2 && f4, allCols)).as("n_distinct_country"))
      else
        Seq(cnt(f1 && f2 && f4).as("n_after_country")))
    val row = df.agg(aggs.head, aggs.tail: _*)
      .head()

    val (nDistinct, nAfterCountry) =
      if (dq.removeDuplicates)
        (row.getLong(4),
          if (dq.validateCountryCodes) row.getLong(5) else row.getLong(4))
      else
        (row.getLong(3),
          if (dq.validateCountryCodes) row.getLong(4) else row.getLong(3))

    QualityMetrics(
      inputRows = row.getLong(0),
      removedNullMaterial = row.getLong(1),
      removedInvalidType = row.getLong(2),
      removedDuplicates = row.getLong(3) - nDistinct,
      removedInvalidCountry = nDistinct - nAfterCountry)
  }
}

/** F5/F6 — parameterized filters (`/root/reference/src/etl_entregas.py:184-208`).
  * Date range stays a plain string comparison: YYYYMMDD sorts
  * lexicographically = chronologically, and malformed dates keep the
  * reference's semantics instead of becoming nulls.
  */
object Filters {
  def apply(df: DataFrame, filters: FiltersConfig): DataFrame = {
    val ranged = df.filter(
      col("fecha_proceso") >= lit(filters.startDate) &&
        col("fecha_proceso") <= lit(filters.endDate))
    filters.country match {
      case Some(c) => ranged.filter(upper(col("pais")) === c.toUpperCase)
      case None => ranged
    }
  }
}

/** T1–T21 — the derived-column stage
  * (`/root/reference/src/etl_entregas.py:213-391`). One `select` — a single
  * Catalyst Project the whole-stage codegen fuses with the scan; every
  * expression is a builtin, no UDFs.
  */
object Transform {

  def apply(df: DataFrame, cfg: EtlConfig): DataFrame = {
    val rules = cfg.businessRules
    val csFactor = rules.unitsConversion.getOrElse("CS", 20.0d)
    val stFactor = rules.unitsConversion.getOrElse("ST", 1.0d)

    // T1 — string → double casts (0E-18 parses to 0.0 under double
    // semantics, matching the reference's DoubleType cast).
    val precio = col("precio").cast(DoubleType)
    val cantidad = col("cantidad").cast(DoubleType)

    // T2 — unit conversion by CASE over `unidad`.
    val cantidadUnidades =
      when(col("unidad") === "CS", cantidad * lit(csFactor))
        .when(col("unidad") === "ST", cantidad * lit(stFactor))
        .otherwise(cantidad)

    // T3/T4/T5 — delivery-type classification + flags.
    val esRutina = col("tipo_entrega").isin(rules.routineTypes: _*)
    val esBono = col("tipo_entrega").isin(rules.bonusTypes: _*)
    val categoria =
      when(esRutina, "RUTINA").when(esBono, "BONIFICACION").otherwise("OTRO")

    // T7 — literal-map country-name lookup; null when absent, exactly the
    // reference's create_map semantics.
    val countryMap = typedLit(cfg.countryNames)
    val nombrePais = countryMap(upper(col("pais")))

    // T13/T14 — date parsed once, consumed by the calendar columns; the
    // temp column never materializes (single Project).
    val fechaDate = to_date(col("fecha_proceso"), "yyyyMMdd")
    val diaSemana = dayofweek(fechaDate) // 1=Sunday … 7=Saturday
    val nombreDia = when(diaSemana === 1, "Domingo")
      .when(diaSemana === 2, "Lunes")
      .when(diaSemana === 3, "Martes")
      .when(diaSemana === 4, "Miércoles")
      .when(diaSemana === 5, "Jueves")
      .when(diaSemana === 6, "Viernes")
      .otherwise("Sábado")

    val diaProceso = substring(col("fecha_proceso"), 7, 2).cast(IntegerType)

    df.select(
      col("pais"), col("fecha_proceso"), col("transporte"), col("ruta"),
      col("tipo_entrega"), col("material"),
      precio.as("precio"),
      cantidad.as("cantidad"),
      col("unidad"),
      cantidadUnidades.as("cantidad_unidades"),
      categoria.as("categoria_entrega"),
      when(esRutina, true).otherwise(false).as("es_entrega_rutina"),
      when(esBono, true).otherwise(false).as("es_entrega_bonificacion"),
      round(precio * cantidadUnidades, 2).as("precio_total"),
      nombrePais.as("nombre_pais"),
      current_timestamp().as("fecha_procesamiento_etl"),
      when(cantidadUnidades > 0, round(precio / cantidadUnidades, 4))
        .otherwise(0.0d).as("precio_por_unidad"),
      when(precio === 0, true).otherwise(false).as("es_bonificacion_gratuita"),
      substring(col("fecha_proceso"), 1, 4).cast(IntegerType).as("anio_proceso"),
      substring(col("fecha_proceso"), 5, 2).cast(IntegerType).as("mes_proceso"),
      diaProceso.as("dia_proceso"),
      diaSemana.as("dia_semana"),
      nombreDia.as("nombre_dia_semana"),
      weekofyear(fechaDate).as("semana_del_anio"),
      quarter(fechaDate).as("trimestre"),
      when(diaProceso <= 10, "INICIO_MES")
        .when(diaProceso >= 21, "FIN_MES")
        .otherwise("MEDIADOS_MES").as("periodo_mes"),
      when(cantidadUnidades <= 20, "BAJO")
        .when(cantidadUnidades <= 100, "MEDIO")
        .when(cantidadUnidades <= 500, "ALTO")
        .otherwise("MUY_ALTO").as("rango_volumen"),
      when(round(precio * cantidadUnidades, 2) > 1000, true).otherwise(false)
        .as("es_alto_valor"),
      when(col("ruta").isNotNull, substring(col("ruta"), 1, 2))
        .otherwise("ND").as("codigo_region"))
  }
}

/** R1/R2 — rename + 28-column ordered contract
  * (`/root/reference/src/etl_entregas.py:393-461`).
  */
object Standardize {
  def apply(df: DataFrame, cfg: EtlConfig): DataFrame = {
    val renames = cfg.columnMapping.filter { case (o, n) => o != n }.toMap
    val renamed = df.withColumnsRenamed(renames)
    val existing = Schemas.outputColumns.filter(renamed.columns.contains)
    renamed.select(existing.map(col): _*)
  }
}

/** S3 — partitioned CSV sink. Replaces the reference's per-date driver
  * collect loop (`/root/reference/src/etl_entregas.py:469-518`, a
  * `toPandas()` per partition!) with Spark's native partitioned write:
  * one distributed job, same `fecha_proceso=YYYYMMDD/` directory layout,
  * no data through the driver — the design that survives 100 TB.
  */
object Load {

  /** Writes and returns per-partition row counts (the reference's
    * `partitions_created` metric), computed as one aggregate.
    *
    * `format`: `csv` (reference-parity, default) or `parquet` — at scale
    * parquet is the right sink (columnar, splittable, statistics for
    * downstream pruning); the directory layout is identical.
    *
    * The counts aggregate is submitted CONCURRENTLY with the write
    * (guide §2.6 — actions are only sequential because the driver calls
    * them sequentially): both read the same cached upstream, neither
    * depends on the other, and the counts job back-fills cores the
    * write's tail leaves idle. Values are unchanged — the aggregate
    * reads the DataFrame, not the sink.
    */
  def apply(df: DataFrame, outputBase: String, format: String = "csv"): Map[String, Long] = {
    val writer = df.write
      .partitionBy("fecha_proceso")
      .mode("overwrite")
    val doWrite: () => Unit = format match {
      case "csv" => () => writer.option("header", "true").csv(outputBase)
      case "parquet" => () => writer.parquet(outputBase)
      case other => throw new IllegalArgumentException(
        s"unsupported output format: $other (csv | parquet)")
    }
    val countsF = scala.concurrent.Future {
      df.groupBy("fecha_proceso").agg(count(lit(1)).as("n"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
    }(scala.concurrent.ExecutionContext.global)
    doWrite()
    scala.concurrent.Await.result(countsF,
      scala.concurrent.duration.Duration.Inf)
  }
}
