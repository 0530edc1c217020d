package graft.etl

import java.nio.file.{Files, Paths}

/** CLI entry point, mirroring the reference's surface
  * (`/root/reference/main.py:80-122`):
  *
  *   runMain graft.etl.Main [--config-dir DIR] [--env E] [--dry-run]
  *     [--show-config] [--metrics-out FILE] [key.path=value ...]
  *
  * Unknown `k=v` args are OmegaConf-style dotlist overrides applied last
  * (precedence base < env < CLI). `--dry-run`/`--show-config` are
  * config-only paths that never start Spark.
  */
object Main {

  def main(args: Array[String]): Unit = {
    var configDir = "config"
    var env: Option[String] = None
    var dryRun = false
    var showConfig = false
    var metricsOut = "execution_metrics.json"
    val dotlist = Seq.newBuilder[String]

    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--config-dir" => configDir = args(i + 1); i += 2
        case "--env" => env = Some(args(i + 1)); i += 2
        case "--dry-run" => dryRun = true; i += 1
        case "--show-config" => showConfig = true; i += 1
        case "--metrics-out" => metricsOut = args(i + 1); i += 2
        case kv if kv.contains("=") => dotlist += kv; i += 1
        case other =>
          System.err.println(s"unknown argument: $other"); sys.exit(2)
      }
    }

    val config = ConfigLoader.load(configDir, env, dotlist.result())

    config.filters.validate() match {
      case Left(err) => System.err.println(s"invalid filters: $err"); sys.exit(1)
      case Right(()) =>
    }

    if (showConfig || dryRun) {
      println(s"environment: ${config.environment}")
      println(s"filters: ${config.filters}")
      println(s"paths: ${config.paths}")
      println(s"business_rules: ${config.businessRules}")
      println(s"data_quality: ${config.dataQuality}")
      if (dryRun) println("dry-run: no Spark session created")
      return
    }

    val etl = EntregasEtl(config)
    try {
      val metrics = etl.run()
      println(metrics.toJson)
      Files.writeString(Paths.get(metricsOut), metrics.toJson)
      println(s"metrics written to $metricsOut")
    } finally etl.spark.stop()
  }
}
