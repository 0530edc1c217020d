package graft.etl

import org.apache.spark.sql.types._

/** Schema contracts for the delivery-ETL pipeline.
  *
  * The raw CSV is read with an explicit all-string schema — same semantics
  * as the reference's `inferSchema=false` (`/root/reference/src/
  * etl_entregas.py:103`) but self-documenting, and at 100 TB it avoids the
  * schema-inference pre-pass entirely.
  */
object Schemas {

  val rawColumns: Seq[String] = Seq(
    "pais", "fecha_proceso", "transporte", "ruta", "tipo_entrega",
    "material", "precio", "cantidad", "unidad")

  val raw: StructType =
    StructType(rawColumns.map(StructField(_, StringType, nullable = true)))

  /** Final 29-column ordered contract
    * (`/root/reference/src/etl_entregas.py:412-457` — the reference docs
    * say "28" but its own list has 29 entries; the code is the truth).
    */
  val outputColumns: Seq[String] = Seq(
    // geography
    "codigo_pais", "nombre_pais", "codigo_region",
    // calendar
    "fecha_proceso", "anio_proceso", "trimestre", "mes_proceso",
    "semana_del_anio", "dia_proceso", "dia_semana", "nombre_dia_semana",
    "periodo_mes",
    // transport
    "id_transporte", "id_ruta",
    // product
    "codigo_material",
    // delivery type
    "codigo_tipo_entrega", "categoria_entrega", "es_entrega_rutina",
    "es_entrega_bonificacion",
    // quantities
    "cantidad_original", "unidad_original", "cantidad_unidades",
    "rango_volumen",
    // prices
    "precio_unitario", "precio_por_unidad", "precio_total",
    "es_bonificacion_gratuita", "es_alto_valor",
    // metadata
    "fecha_procesamiento_etl")
}
