package graft

/** Spark 4 ships with ANSI mode ON; the Verify/Bench harnesses pin it
  * off for oracle parity, but library code must not depend on that —
  * dirty casts go through try_cast, date/string comparisons must be
  * ANSI-legal. This spec runs the cast- and coercion-heavy queries in
  * an ANSI session clone (one full all-query sweep ran clean; this
  * keeps the representative subset gated in CI time).
  */
class AnsiSmokeSpec extends SparkSpec {

  private val subset = Seq(
    "q_fixedwidth_parse", // try_cast of trimmed substrings
    "q_flagship_agg",     // floor/avg/sum numeric tower
    "q_mway_join",        // string-literal date comparison
    "q_date_math",        // date arithmetic + string cast
    "q_props_extract",    // from_json / get_json_object int casts
    "q_scalar_subquery",  // SQL-surface decimal literal cast
    "q_moving_avg",       // long agg + frame avg
    "q_pii_redact",       // numeric → string concat tower
    "q_quota_sample",     // integer div quota + md5-of-cast ordering
    "q_latest_by_key",    // struct-ordered max_by + timestamp format
    "q_interpolate",      // double interpolation arithmetic
    "q_histogram",        // floor-division binning + least/greatest clamp
    "q_pack_sequences",   // integer div over window cumsum
    "q_vector_stats",     // float→double norm tower
    "q_knn_eval",         // negated int tie-break + ratio cast
    "q_topk_agg",         // UDAF buffer encoders + pos+1 long cast
    "q_incr_agg",         // partial-state sums + division
    "q_column_profile",   // min/max double casts across 4 columns
    "q_mixture_balance",  // cumulative long window + budget compare
    "q_vocab_growth",     // integer div decile bucketing
    "q_graph_stats",      // int→double lcc ratio
    "q_range_lookup",     // non-equi double band compare
    "q_weighted_sample",  // conv(hex)→long→double priority division
    "q_group_split",      // instr-arithmetic nibble bucket
    "q_quantized_topk",   // round→long quantization + int dot tower
    "q_oov_rate",         // exact-count division
    "q_containment",      // count-ratio divisions
    "q_ewma",             // double-literal fold tower inside aggregate() HOF
    "q_psi_drift",        // floor-div binning + ln ratio tower
    "q_winsorize",        // percentile bounds + clamp
    "q_standardize",      // double->long power-sum casts
    "q_tpch_q18ish",      // long quantity casts + date format
    "q_simhash_dedup",    // shift/mask/xor bit tower
    "q_dsv2_scan",        // rpad-formatted write + try_cast decode roundtrip
    "q_ks_test",          // int/long arm + floor-quantized value casts
    "q_attribution",      // unix_micros + struct-max carry
    "q_random_projection") // element_at + double kernel products

  test("cast-heavy queries run under ANSI mode") {
    val ansi = spark.newSession()
    ansi.conf.set("spark.sql.ansi.enabled", "true")
    subset.foreach { name =>
      val n = SparkEntry.queries(name)(ansi, SparkSpec.sf0001).count()
      assert(n > 0, s"$name returned no rows under ANSI")
    }
  }
}
