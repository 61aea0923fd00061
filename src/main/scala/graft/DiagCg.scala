package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r15 optimization): per-invocation whole-stage
  * codegen recompile counter. The r15 baseline bench showed 9 queries
  * re-compiling generated sources on the WARM pass (~15 s of a 125 s
  * draw) — a warm query whose compile count still moves is generating
  * DIFFERENT source text per invocation (the Janino cache is keyed on
  * source). This main runs one query N times and prints the compile
  * count + approx ms delta per iteration; with SPARK_GRAFT_CG_DUMP set
  * it also dumps `debugCodegen` output per iteration to /tmp for a
  * source-level diff. Not part of the declared surface.
  * Usage: tools/run.sh graft.DiagCg <sfDir> <query> [iters]
  */
object DiagCg {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val q = args(1)
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.codegen.useIdInClassName",
        sys.env.getOrElse("SPARK_GRAFT_CG_IDNAME", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val h = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
    // reflection probe: the Janino cache's live entry count + capacity —
    // Spark 4.1 sizes it ONCE at CodeGenerator class-init from whichever
    // SQLConf is visible on that thread, so the session's
    // spark.sql.codegen.cache.maxEntries may silently not apply
    def cacheSize(): String = try {
      val cls = Class.forName(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$")
      val mod = cls.getField("MODULE$").get(null)
      val m = cls.getDeclaredMethod("cache")
      m.setAccessible(true)
      val c = m.invoke(mod)
      // Spark shades guava (org.sparkproject.guava); find the delegate
      // cache field reflectively and call size()/stats() by name
      def fieldsOf(o: Any): Seq[java.lang.reflect.Field] = {
        var k: Class[_] = o.getClass; var out = Seq.empty[java.lang.reflect.Field]
        while (k != null) { out ++= k.getDeclaredFields; k = k.getSuperclass }
        out
      }
      val inner = fieldsOf(c).find(_.getType.getName.contains("ache"))
      inner.map { f =>
        f.setAccessible(true)
        val g = f.get(c)
        val ms = g.getClass.getMethod("size"); ms.setAccessible(true)
        val size = ms.invoke(g)
        val stats = try {
          val mt = g.getClass.getMethod("stats"); mt.setAccessible(true)
          mt.invoke(g).toString
        } catch { case _: Throwable => "?" }
        s"entries=$size stats=$stats"
      }.getOrElse("no-cache-field:" +
        fieldsOf(c).map(f => f.getName + ":" + f.getType.getName).mkString(","))
    } catch { case e: Throwable => s"probe-failed: $e" }
    val fn = SparkEntry.queries(q)
    // per-iteration key-set snapshot: was a new cache key a brand-new
    // source body, or a known body compiled under the other classloader?
    def keySnapshot(): Set[(Int, String)] = try {
      val cls = Class.forName(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$")
      val mod = cls.getField("MODULE$").get(null)
      val m = cls.getDeclaredMethod("cache"); m.setAccessible(true)
      val c = m.invoke(mod)
      var k: Class[_] = c.getClass
      var f: java.lang.reflect.Field = null
      while (f == null && k != null) {
        f = k.getDeclaredFields.find(_.getType.getName.contains("ache")).orNull
        if (f == null) k = k.getSuperclass
      }
      f.setAccessible(true)
      val g = f.get(c)
      val am = g.getClass.getMethod("asMap"); am.setAccessible(true)
      val map = am.invoke(g).asInstanceOf[java.util.Map[AnyRef, AnyRef]]
      map.keySet().toArray.toSeq.map { kk =>
        val t = kk.asInstanceOf[Tuple2[AnyRef, AnyRef]]
        val body = t._2.asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.codegen.CodeAndComment].body
        (body.hashCode,
          String.valueOf(t._1.asInstanceOf[java.lang.ref.WeakReference[AnyRef]].get))
      }.toSet
    } catch { case _: Throwable => Set.empty }
    var prevKeys = Set.empty[(Int, String)]
    var prevBodies = Set.empty[Int]
    def bodyByHash(): Map[Int, String] = try {
      val cls = Class.forName(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$")
      val mod = cls.getField("MODULE$").get(null)
      val m = cls.getDeclaredMethod("cache"); m.setAccessible(true)
      val c = m.invoke(mod)
      var k: Class[_] = c.getClass
      var f: java.lang.reflect.Field = null
      while (f == null && k != null) {
        f = k.getDeclaredFields.find(_.getType.getName.contains("ache")).orNull
        if (f == null) k = k.getSuperclass
      }
      f.setAccessible(true)
      val g = f.get(c)
      val am = g.getClass.getMethod("asMap"); am.setAccessible(true)
      val map = am.invoke(g).asInstanceOf[java.util.Map[AnyRef, AnyRef]]
      map.keySet().toArray.toSeq.map { kk =>
        val body = kk.asInstanceOf[Tuple2[AnyRef, AnyRef]]._2.asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.codegen.CodeAndComment].body
        body.hashCode -> body
      }.toMap
    } catch { case _: Throwable => Map.empty }
    for (i <- 1 to iters) {
      val c0 = h.getCount
      val t0 = System.nanoTime()
      val df = fn(spark, d)
      df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val taskCl = spark.sparkContext.parallelize(Seq(1), 1)
        .map(_ => String.valueOf(Thread.currentThread().getContextClassLoader))
        .collect()(0)
      // the loader a SQL task's codegen compile would key on (SQL jobs can
      // carry per-session isolated artifact classloaders, unlike raw RDD
      // jobs)
      import org.apache.spark.sql.functions.udf
      val clUdf = udf(() =>
        String.valueOf(Thread.currentThread().getContextClassLoader))
      val sqlCl = spark.range(1).select(clUdf().as("cl"))
        .collect()(0).getString(0)
      println(f"iter=$i compiles=${h.getCount - c0} wall=$dt%.3fs cache[${cacheSize()}]")
      println(s"  driverCl=${Thread.currentThread().getContextClassLoader} taskCl=$taskCl sqlTaskCl=$sqlCl")
      val now = keySnapshot()
      val newKeys = now -- prevKeys
      val bodies = now.map(_._1)
      val newBodyKeys = newKeys.filter(k => !prevBodies.contains(k._1))
      println(s"  newKeys=${newKeys.size} ofWhichNewBodies=${newBodyKeys.size} " +
        s"newLoaderOnly=${newKeys.size - newBodyKeys.size}")
      newKeys.groupBy(_._2).foreach { case (l, ks) =>
        println(s"    loader=$l newKeys=${ks.size}") }
      // dump the new bodies tagged by iteration for offline nearest diff
      if (sys.env.contains("SPARK_GRAFT_CG_DUMP")) {
        val wanted = newBodyKeys.map(_._1)
        bodyByHash().filter(kv => wanted.contains(kv._1)).foreach { case (hsh, body) =>
          val cn = "class (\\w+)".r.findFirstMatchIn(body).map(_.group(1))
            .getOrElse("anon")
          val fw = new java.io.FileWriter(s"/tmp/cgit${i}_${cn}_$hsh.java")
          fw.write(body); fw.close()
        }
      }
      prevKeys = now; prevBodies = bodies
      if (sys.env.contains("SPARK_GRAFT_CG_DUMP")) {
        // descend into AQE's final plan — codegenString on the adaptive
        // wrapper itself reports zero WSCG subtrees
        val plan = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }
        val code = org.apache.spark.sql.execution.debug.codegenString(plan)
        val fw = new java.io.FileWriter(s"/tmp/cg_${q}_$i.txt")
        fw.write(code); fw.close()
        val fw2 = new java.io.FileWriter(s"/tmp/plan_${q}_$i.txt")
        fw2.write(plan.toString); fw2.close()
      }
      // from iter 2 on, log every ACTUAL Janino compile's formatted source
      // (cache misses only) so a source-level diff can pinpoint what
      // varies between invocations of an identical query
      if (i == 1 && sys.env.contains("SPARK_GRAFT_CG_LOG"))
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
          org.apache.logging.log4j.Level.DEBUG)
    }
    // dump the cache KEYS: (weak classloader ref, code body) — how many
    // distinct loaders, and how many bodies appear under >1 loader / how
    // many near-identical bodies differ textually
    try {
      val cls = Class.forName(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$")
      val mod = cls.getField("MODULE$").get(null)
      val m = cls.getDeclaredMethod("cache"); m.setAccessible(true)
      val c = m.invoke(mod)
      var k: Class[_] = c.getClass
      var f: java.lang.reflect.Field = null
      while (f == null && k != null) {
        f = k.getDeclaredFields.find(_.getType.getName.contains("ache")).orNull
        if (f == null) k = k.getSuperclass
      }
      f.setAccessible(true)
      val g = f.get(c)
      val am = g.getClass.getMethod("asMap"); am.setAccessible(true)
      val map = am.invoke(g).asInstanceOf[java.util.Map[AnyRef, AnyRef]]
      val keys = map.keySet().toArray.toSeq.map(_.asInstanceOf[Tuple2[AnyRef, AnyRef]])
      val byBody = keys.groupBy(_._2.asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.codegen.CodeAndComment].body)
      println(s"cache keys=${keys.size} distinctBodies=${byBody.size} " +
        s"distinctLoaders=${keys.map(t => System.identityHashCode(
          t._1.asInstanceOf[java.lang.ref.WeakReference[AnyRef]].get)).distinct.size}")
      val multi = byBody.filter(_._2.size > 1)
      println(s"bodies under >1 key: ${multi.size}")
      multi.take(3).foreach { case (body, ks) =>
        println(s"  body ${body.hashCode} keys=${ks.size} loaders=" +
          ks.map(t => String.valueOf(
            t._1.asInstanceOf[java.lang.ref.WeakReference[AnyRef]].get)).mkString(" | "))
      }
      // write every distinct body out for offline diffing (grouped by the
      // generated class name so same-stage bodies can be compared)
      byBody.keys.zipWithIndex.foreach { case (body, i) =>
        val cn = "class (\\w+)".r.findFirstMatchIn(body).map(_.group(1))
          .getOrElse("anon")
        val fw = new java.io.FileWriter(s"/tmp/cgbody_${cn}_$i.java")
        fw.write(body); fw.close()
      }
    } catch { case e: Throwable => println(s"keydump-failed: $e") }
    spark.stop()
  }
}
