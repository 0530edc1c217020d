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

  final case class CliOptions(
      configDir: String = "config",
      env: Option[String] = None,
      dryRun: Boolean = false,
      showConfig: Boolean = false,
      metricsOut: String = "execution_metrics.json",
      dotlist: Seq[String] = Nil)

  /** Pure argument parser (testable; `main` adds the exits). */
  def parseArgs(args: Array[String]): Either[String, CliOptions] = {
    var opts = CliOptions()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case flag @ ("--config-dir" | "--env" | "--metrics-out") =>
          if (i + 1 >= args.length) return Left(s"$flag requires a value")
          opts = flag match {
            case "--config-dir" => opts.copy(configDir = args(i + 1))
            case "--env" => opts.copy(env = Some(args(i + 1)))
            case _ => opts.copy(metricsOut = args(i + 1))
          }
          i += 2
        case "--dry-run" => opts = opts.copy(dryRun = true); i += 1
        case "--show-config" => opts = opts.copy(showConfig = true); i += 1
        case kv if kv.contains("=") && !kv.startsWith("--") =>
          opts = opts.copy(dotlist = opts.dotlist :+ kv); i += 1
        case other => return Left(s"unknown argument: $other")
      }
    }
    Right(opts)
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args) match {
      case Left(err) => System.err.println(err); sys.exit(2)
      case Right(o) => o
    }
    val configDir = opts.configDir
    val env = opts.env
    val dryRun = opts.dryRun
    val showConfig = opts.showConfig
    val metricsOut = opts.metricsOut

    val config = ConfigLoader.load(configDir, env, opts.dotlist)

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
