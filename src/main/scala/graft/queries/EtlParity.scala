package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** SURVEY.md §2 operator inventory, exercised on the TESTDATA tables.
  *
  * Each query maps 1:1 to an operator row of the reference inventory
  * (reference file:line cited per query). The reference pipeline itself
  * (CSV in, 28-column contract out) lives in `graft.etl` and is tested
  * against the shipped CSV in `EtlPipelineSpec`; these queries prove the
  * same operator semantics against the DuckDB oracle at sf0.01.
  */
object EtlParity {

  private val dec6 = DecimalType(38, 6)

  def defs: Seq[GraftQuery] = Seq(

    // F1 — null/empty-string filter (src/etl_entregas.py:138-145)
    GraftQuery(
      "etl_f1_notnull_filter",
      (s, dir) =>
        Tables.table(s, dir, "documents")
          .filter(col("text").isNotNull && trim(col("text")) =!= "")
          .select(col("doc_id"), col("lang")),
      Some("SELECT doc_id, lang FROM documents WHERE text IS NOT NULL AND trim(text) <> ''")),

    // F2 — value whitelist via IN (src/etl_entregas.py:147-155)
    GraftQuery(
      "etl_f2_whitelist",
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .filter(col("o_orderstatus").isin("O", "F"))
          .select(col("o_orderkey"), col("o_orderstatus")),
      Some("SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus IN ('O','F')")),

    // F3 — exact-duplicate elimination (src/etl_entregas.py:157-162)
    GraftQuery(
      "etl_f3_dedup_exact",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"))
          .dropDuplicates(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // F5 — range filter on an ordered column (src/etl_entregas.py:194-198)
    GraftQuery(
      "etl_f5_range_filter",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate")),
      Some("SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'")),

    // F6 — case-normalized equality filter (src/etl_entregas.py:200-202)
    GraftQuery(
      "etl_f6_upper_eq_filter",
      (s, dir) =>
        Tables.table(s, dir, "customer")
          .filter(upper(col("c_mktsegment")) === "BUILDING")
          .select(col("c_custkey"), col("c_mktsegment")),
      Some("SELECT c_custkey, c_mktsegment FROM customer WHERE upper(c_mktsegment) = 'BUILDING'")),

    // T2 — CASE-driven unit conversion (src/etl_entregas.py:235-241)
    GraftQuery(
      "etl_t2_unit_conversion",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            when(col("l_returnflag") === "R", col("l_quantity") * lit(20.0d))
              .when(col("l_returnflag") === "A", col("l_quantity") * lit(1.0d))
              .otherwise(col("l_quantity"))
              .as("qty_units")),
      Some("SELECT l_orderkey, l_linenumber, " +
        "CASE WHEN l_returnflag = 'R' THEN l_quantity * CAST(20 AS DOUBLE) " +
        "WHEN l_returnflag = 'A' THEN l_quantity * CAST(1 AS DOUBLE) " +
        "ELSE l_quantity END AS qty_units FROM lineitem")),

    // T3/T4/T5 — CASE classification + boolean flags (src/etl_entregas.py:243-260)
    GraftQuery(
      "etl_t3_classify_flags",
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .select(
            col("o_orderkey"),
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "RUTINA")
              .when(col("o_orderpriority").isin("3-MEDIUM"), "BONIFICACION")
              .otherwise("OTRO")
              .as("categoria"),
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), true).otherwise(false)
              .as("es_rutina"),
            when(col("o_orderstatus") === "O", true).otherwise(false)
              .as("es_abierta")),
      Some("SELECT o_orderkey, " +
        "CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'RUTINA' " +
        "WHEN o_orderpriority IN ('3-MEDIUM') THEN 'BONIFICACION' ELSE 'OTRO' END AS categoria, " +
        "CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN true ELSE false END AS es_rutina, " +
        "CASE WHEN o_orderstatus = 'O' THEN true ELSE false END AS es_abierta FROM orders")),

    // T6 — derived total with HALF_UP rounding (src/etl_entregas.py:262-266).
    // Rounding happens on a decimal: round(double, n) disagrees between
    // engines on exact-half shortest-representations.
    GraftQuery(
      "etl_t6_round_total",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round((col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).cast(dec6), 2)
              .cast(DoubleType).as("precio_total")),
      Some("SELECT l_orderkey, l_linenumber, " +
        "CAST(round(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)), 2) AS DOUBLE) " +
        "AS precio_total FROM lineitem")),

    // T7 — literal-map dimension lookup, null when absent
    // (src/etl_entregas.py:268-273; map from config/config.yaml:91-97)
    GraftQuery(
      "etl_t7_maplit_lookup",
      (s, dir) => {
        val statusNames = typedLit(Map("O" -> "Open", "F" -> "Finished"))
        Tables.table(s, dir, "orders")
          .select(col("o_orderkey"), statusNames(col("o_orderstatus")).as("status_name"))
      },
      Some("SELECT o_orderkey, CASE o_orderstatus WHEN 'O' THEN 'Open' " +
        "WHEN 'F' THEN 'Finished' ELSE NULL END AS status_name FROM orders")),

    // T9 — guarded division (src/etl_entregas.py:281-287); raw IEEE division,
    // bit-identical across engines on identical operands.
    GraftQuery(
      "etl_t9_safe_ratio",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            when(col("l_quantity") > 0, col("l_extendedprice") / col("l_quantity"))
              .otherwise(lit(0.0d))
              .as("unit_price")),
      Some("SELECT l_orderkey, l_linenumber, " +
        "CASE WHEN l_quantity > 0 THEN l_extendedprice / l_quantity " +
        "ELSE CAST(0 AS DOUBLE) END AS unit_price FROM lineitem")),

    // T10 — zero-test boolean (src/etl_entregas.py:289-293)
    GraftQuery(
      "etl_t10_flag_zero",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            when(col("l_discount") === 0.0d, true).otherwise(false).as("es_gratis")),
      Some("SELECT l_orderkey, l_linenumber, " +
        "CASE WHEN l_discount = 0 THEN true ELSE false END AS es_gratis FROM lineitem")),

    // T11-T17 — calendar decomposition (src/etl_entregas.py:295-349):
    // year/month/day/quarter/ISO week/dayofweek + Spanish day names.
    // Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday (hence +1).
    GraftQuery(
      "etl_t11_date_parts",
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("anio"),
            month(col("o_orderdate")).as("mes"),
            dayofmonth(col("o_orderdate")).as("dia"),
            quarter(col("o_orderdate")).as("trimestre"),
            weekofyear(col("o_orderdate")).as("semana"),
            dayofweek(col("o_orderdate")).as("dia_semana"),
            when(dayofweek(col("o_orderdate")) === 1, "Domingo")
              .when(dayofweek(col("o_orderdate")) === 2, "Lunes")
              .when(dayofweek(col("o_orderdate")) === 3, "Martes")
              .when(dayofweek(col("o_orderdate")) === 4, "Miércoles")
              .when(dayofweek(col("o_orderdate")) === 5, "Jueves")
              .when(dayofweek(col("o_orderdate")) === 6, "Viernes")
              .otherwise("Sábado")
              .as("nombre_dia")),
      Some("SELECT o_orderkey, " +
        "CAST(year(o_orderdate) AS INT) AS anio, " +
        "CAST(month(o_orderdate) AS INT) AS mes, " +
        "CAST(day(o_orderdate) AS INT) AS dia, " +
        "CAST(quarter(o_orderdate) AS INT) AS trimestre, " +
        "CAST(weekofyear(o_orderdate) AS INT) AS semana, " +
        "CAST(dayofweek(o_orderdate) + 1 AS INT) AS dia_semana, " +
        "CASE CAST(dayofweek(o_orderdate) + 1 AS INT) " +
        "WHEN 1 THEN 'Domingo' WHEN 2 THEN 'Lunes' WHEN 3 THEN 'Martes' " +
        "WHEN 4 THEN 'Miércoles' WHEN 5 THEN 'Jueves' WHEN 6 THEN 'Viernes' " +
        "ELSE 'Sábado' END AS nombre_dia FROM orders")),

    // T18/T19 — ordered CASE bucketing (src/etl_entregas.py:351-370)
    GraftQuery(
      "etl_t18_bucketize",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            when(dayofmonth(col("l_shipdate")) <= 10, "INICIO_MES")
              .when(dayofmonth(col("l_shipdate")) >= 21, "FIN_MES")
              .otherwise("MEDIADOS_MES")
              .as("periodo_mes"),
            when(col("l_quantity") <= 10, "BAJO")
              .when(col("l_quantity") <= 25, "MEDIO")
              .when(col("l_quantity") <= 40, "ALTO")
              .otherwise("MUY_ALTO")
              .as("rango_volumen")),
      Some("SELECT l_orderkey, l_linenumber, " +
        "CASE WHEN day(l_shipdate) <= 10 THEN 'INICIO_MES' " +
        "WHEN day(l_shipdate) >= 21 THEN 'FIN_MES' ELSE 'MEDIADOS_MES' END AS periodo_mes, " +
        "CASE WHEN l_quantity <= 10 THEN 'BAJO' WHEN l_quantity <= 25 THEN 'MEDIO' " +
        "WHEN l_quantity <= 40 THEN 'ALTO' ELSE 'MUY_ALTO' END AS rango_volumen FROM lineitem")),

    // T20 — es_alto_valor threshold flag (src/etl_entregas.py:372-378).
    // The compared product is the same IEEE multiply on the same double
    // operands in both engines, so the boolean is deterministic.
    GraftQuery(
      "etl_t20_high_value",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            when(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) > lit(30000.0d), true)
              .otherwise(false)
              .as("es_alto_valor")),
      Some("SELECT l_orderkey, l_linenumber, " +
        "CASE WHEN l_extendedprice * (1 - l_discount) > CAST(30000 AS DOUBLE) " +
        "THEN true ELSE false END AS es_alto_valor FROM lineitem")),

    // T21 — null-guarded substring with default (src/etl_entregas.py:380-386)
    GraftQuery(
      "etl_t21_substr_default",
      (s, dir) =>
        Tables.table(s, dir, "supplier")
          .select(
            col("s_suppkey"),
            when(col("s_name").isNotNull, substring(col("s_name"), 1, 2))
              .otherwise("ND")
              .as("codigo_region")),
      Some("SELECT s_suppkey, CASE WHEN s_name IS NOT NULL THEN substr(s_name, 1, 2) " +
        "ELSE 'ND' END AS codigo_region FROM supplier")),

    // R1/R2 — rename + ordered projection contract (src/etl_entregas.py:393-461)
    GraftQuery(
      "etl_r1_rename_project",
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .withColumnsRenamed(Map(
            "l_orderkey" -> "id_orden",
            "l_partkey" -> "id_producto",
            "l_quantity" -> "cantidad_original",
            "l_extendedprice" -> "precio_unitario"))
          .select("id_orden", "id_producto", "cantidad_original", "precio_unitario"),
      Some("SELECT l_orderkey AS id_orden, l_partkey AS id_producto, " +
        "l_quantity AS cantidad_original, l_extendedprice AS precio_unitario FROM lineitem")),

    // A1 — global count (src/etl_entregas.py:108 et al.)
    GraftQuery(
      "etl_a1_count",
      (s, dir) =>
        Tables.table(s, dir, "lineitem").agg(count(lit(1)).as("n")),
      Some("SELECT count(*) AS n FROM lineitem")),

    // A2 — distinct partition values (src/etl_entregas.py:484-486)
    GraftQuery(
      "etl_a2_distinct_dates",
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .select(to_date(col("o_orderdate")).as("fecha"))
          .distinct(),
      Some("SELECT DISTINCT CAST(o_orderdate AS DATE) AS fecha FROM orders")),

    // S4 — JSON metrics sink (main.py:233-238; RunMetrics.toJson). The
    // real quality pipeline (DataQuality.metrics — the reference's
    // sequential-delta counters) runs over an entregas-shaped mapping of
    // `orders` with planted empty materials, invalid types, invalid
    // countries, and exact duplicates; the resulting metrics dict is
    // rendered to JSON and PARSED BACK, so the gate row checks the
    // serialized artifact itself: the quintuple must survive the
    // serialize→parse round trip and match an independent SQL recompute.
    GraftQuery(
      "etl_s4_metrics_json",
      (s, dir) => {
        val base = Tables.table(s, dir, "orders").select(
          col("o_orderkey"),
          when(col("o_orderstatus") === "O", "GT")
            .when(col("o_orderstatus") === "F", "SV")
            .otherwise("XX").as("pais"),
          col("o_orderpriority").as("tipo_entrega"),
          when(col("o_orderkey") % 13 === 0, "")
            .otherwise(col("o_custkey").cast("string")).as("material"))
        val planted = base.union(base.filter(col("o_orderkey") % 17 === 0))
        val cfg = graft.etl.EtlConfig(
          environment = "gate",
          paths = graft.etl.PathsConfig("", ""),
          filters = graft.etl.FiltersConfig("19920101", "19981231", None),
          spark = graft.etl.SparkConfig("gate", "local", "WARN", Map.empty),
          businessRules = graft.etl.BusinessRules(
            Map.empty, Seq("1-URGENT", "2-HIGH"), Seq("3-MEDIUM")),
          dataQuality = graft.etl.DataQualityConfig(
            removeNullMaterial = true, removeZeroPrice = false,
            removeDuplicates = true, validateCountryCodes = true,
            validCountries = Seq("GT", "SV")),
          columnMapping = Nil,
          countryNames = Map.empty)
        val m = graft.etl.DataQuality.metrics(planted, cfg)
        val metrics = graft.etl.RunMetrics(
          environment = "gate", startDate = "19920101", endDate = "19981231",
          country = None, quality = m, finalRows = m.outputRows,
          partitionsCreated = Map("19920101" -> m.outputRows),
          outputPath = "memory://gate", outputFormat = "parquet",
          startTimeIso = "1970-01-01T00:00:00", endTimeIso = "1970-01-01T00:00:00",
          executionTimeSeconds = 0.0)
        import s.implicits._
        Seq(metrics.toJson).toDF("j").select(
          get_json_object(col("j"), "$.quality_metrics.registros_iniciales")
            .cast("long").as("registros_iniciales"),
          get_json_object(col("j"), "$.quality_metrics.registros_null_material")
            .cast("long").as("registros_null_material"),
          get_json_object(col("j"), "$.quality_metrics.registros_duplicados")
            .cast("long").as("registros_duplicados"),
          get_json_object(col("j"), "$.quality_metrics.registros_tipo_invalido")
            .cast("long").as("registros_tipo_invalido"),
          get_json_object(col("j"), "$.quality_metrics.registros_finales")
            .cast("long").as("registros_finales"),
          get_json_object(col("j"), "$.final_record_count")
            .cast("long").as("final_record_count"))
      },
      Some("WITH m AS (SELECT o_orderkey, " +
        "CASE WHEN o_orderstatus = 'O' THEN 'GT' WHEN o_orderstatus = 'F' THEN 'SV' " +
        "ELSE 'XX' END AS pais, o_orderpriority AS tipo_entrega, " +
        "CASE WHEN o_orderkey % 13 = 0 THEN '' ELSE CAST(o_custkey AS VARCHAR) END AS material FROM orders), " +
        "u AS (SELECT * FROM m UNION ALL SELECT * FROM m WHERE o_orderkey % 17 = 0), " +
        "f AS (SELECT *, (material IS NOT NULL AND trim(material) <> '') AS ok1, " +
        "tipo_entrega IN ('1-URGENT','2-HIGH','3-MEDIUM') AS ok2, " +
        "upper(pais) IN ('GT','SV') AS ok4 FROM u), " +
        "agg AS (SELECT count(*) AS n_input, " +
        "CAST(sum(CASE WHEN NOT ok1 THEN 1 ELSE 0 END) AS BIGINT) AS n_f1, " +
        "CAST(sum(CASE WHEN ok1 AND NOT ok2 THEN 1 ELSE 0 END) AS BIGINT) AS n_f2, " +
        "CAST(sum(CASE WHEN ok1 AND ok2 THEN 1 ELSE 0 END) AS BIGINT) AS n_after_f2 FROM f), " +
        "d AS (SELECT count(*) AS n_distinct FROM (SELECT DISTINCT o_orderkey, pais, " +
        "tipo_entrega, material FROM f WHERE ok1 AND ok2)), " +
        "c AS (SELECT count(*) AS n_final FROM (SELECT DISTINCT o_orderkey, pais, " +
        "tipo_entrega, material FROM f WHERE ok1 AND ok2 AND ok4)) " +
        "SELECT agg.n_input AS registros_iniciales, agg.n_f1 AS registros_null_material, " +
        "agg.n_after_f2 - d.n_distinct AS registros_duplicados, " +
        "agg.n_f2 AS registros_tipo_invalido, c.n_final AS registros_finales, " +
        "c.n_final AS final_record_count FROM agg, d, c")),

    // S3 — partitioned-sink support: per-partition-value row counts
    // (src/etl_entregas.py:469-518; native partitionBy write in graft.etl.Load)
    GraftQuery(
      "etl_s3_partition_counts",
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("fecha"))
          .agg(count(lit(1)).as("n")),
      Some("SELECT CAST(o_orderdate AS DATE) AS fecha, count(*) AS n FROM orders GROUP BY 1")))
}
