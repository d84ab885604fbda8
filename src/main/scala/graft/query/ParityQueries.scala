package graft.query

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.query.Registry.table

/** The reference's own operator inventory (SURVEY §2) expressed over the
  * driver testdata tables for DuckDB-oracle checking (FIXTURES.md §8).
  * Each query cites the reference operator it re-expresses.
  */
object ParityQueries {

  val all: Seq[Q] = Seq(
    // ----- Q2: point lookup by id (apiClient/apiClient.go:188-243) -----
    Q(
      "q02_point_lookup",
      Some(
        "SELECT event_id, user_id, event_type, ts, value " +
          "FROM events WHERE event_id = 4242 ORDER BY event_id"),
      "equality-predicate point lookup; parquet scan shows PushedFilters on event_id"
    ) { (s, dir) =>
      table(s, dir, "events")
        .filter(col("event_id") === 4242)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .orderBy("event_id")
    },

    // ----- Q3: time-range history search by type (apiClient.go:305-358) -----
    Q(
      "q03_range_search",
      Some(
        "SELECT event_id FROM events WHERE event_type = 'click' AND ts BETWEEN " +
          "TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-15 00:00:00' " +
          "ORDER BY event_id"),
      "range predicate + projection; at scale served by partition pruning on a date-partitioned lake"
    ) { (s, dir) =>
      table(s, dir, "events")
        .filter(
          col("event_type") === "click" &&
            col("ts").between(lit("2024-01-05 00:00:00").cast("timestamp"),
              lit("2024-01-15 00:00:00").cast("timestamp")))
        .select("event_id")
        .orderBy("event_id")
    },

    // ----- K1: composite-key dedup keep-one (storage/mongo_repository.go:44-52) -----
    Q(
      "q04_merge_dedup",
      Some(
        "SELECT user_id, event_type, event_id, ts, value FROM (" +
          "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn " +
          "FROM events) WHERE rn = 1 ORDER BY user_id, event_type"),
      "deterministic keep-first upsert key dedup; single shuffle on the composite key"
    ) { (s, dir) =>
      graft.lake.Lake
        .dedupKeepFirst(table(s, dir, "events"), Seq("user_id", "event_type"), Seq("ts", "event_id"))
        .select("user_id", "event_type", "event_id", "ts", "value")
        .orderBy("user_id", "event_type")
    },

    // ----- K1 decomposition: merge = existing ANTI incoming ∪ dedup(incoming) -----
    Q(
      "q05_merge_upsert",
      Some(
        "WITH existing AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-10 00:00:00'), " +
          "incoming AS (SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'), " +
          "ded AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn FROM incoming) WHERE rn = 1) " +
          "SELECT event_type, count(*) AS n FROM (" +
          "SELECT user_id, event_type FROM existing e WHERE NOT EXISTS (" +
          "SELECT 1 FROM ded d WHERE d.user_id = e.user_id AND d.event_type = e.event_type) " +
          "UNION ALL SELECT user_id, event_type FROM ded) GROUP BY event_type ORDER BY event_type"),
      "full MERGE semantics (last-write-wins upsert) as anti-join + union; broadcastable when the batch is small"
    ) { (s, dir) =>
      val ev = table(s, dir, "events")
      val cut = lit("2024-01-10 00:00:00").cast("timestamp")
      val existing = ev.filter(col("ts") < cut)
      val incoming = ev.filter(col("ts") >= cut)
      graft.lake.Lake
        .merge(existing, incoming, Seq("user_id", "event_type"), Seq("ts", "event_id"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ----- A2: outcome/stats aggregation (datalake/stats.go:9-44) -----
    Q(
      "q06_group_stats",
      Some(
        "SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars " +
          "FROM documents GROUP BY source ORDER BY source"),
      "per-group counters, map-side partial aggregation"
    ) { (s, dir) =>
      table(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("source")
    },

    // ----- S5: filename→source-info regex extraction (generic_extractor.go:17-41) -----
    Q(
      "q07_source_extract",
      Some(
        "SELECT regexp_extract(lower(source), 'src([0-9]+)', 1) AS account_id, count(*) AS n " +
          "FROM documents GROUP BY 1 ORDER BY account_id"),
      "regexp_extract over a lineage column — the input_file_name() extraction pattern"
    ) { (s, dir) =>
      table(s, dir, "documents")
        .select(regexp_extract(lower(col("source")), "src([0-9]+)", 1).as("account_id"))
        .groupBy("account_id")
        .agg(count(lit(1)).as("n"))
        .orderBy("account_id")
    },

    // ----- JSON scalar extraction (stats JSON / API bodies, SURVEY §2.7) -----
    Q(
      "q08_json_extract",
      Some(
        "SELECT event_type, CAST(sum(CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k, " +
          "count(*) AS n FROM events GROUP BY event_type ORDER BY event_type"),
      "get_json_object over a JSON props column"
    ) { (s, dir) =>
      table(s, dir, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ----- P6: MM/dd/yyyy format round-trip (datalake.go:224-233,259) -----
    Q(
      "q09_date_roundtrip",
      Some(
        "SELECT substr(strftime(l_shipdate, '%m/%d/%Y'), 1, 2) AS mo, count(*) AS n " +
          "FROM lineitem GROUP BY 1 ORDER BY mo"),
      "date_format/to_date round-trip parity with the reference's stored string dates"
    ) { (s, dir) =>
      table(s, dir, "lineitem")
        .select(date_format(col("l_shipdate"), "MM/dd/yyyy").substr(1, 2).as("mo"))
        .groupBy("mo")
        .agg(count(lit(1)).as("n"))
        .orderBy("mo")
    },

    // ----- P7/P8: skip-vs-default cast asymmetry (datalake.go:235-255) -----
    Q(
      "q10_cast_validate",
      Some(
        "WITH r AS (SELECT event_type, " +
          "CASE WHEN event_type = 'error' THEN 'not-a-number' ELSE CAST(value AS VARCHAR) END AS amount_str, " +
          "CASE WHEN event_type = 'view' THEN NULL ELSE CAST(value AS VARCHAR) END AS balance_str " +
          "FROM events), c AS (SELECT event_type, TRY_CAST(amount_str AS DOUBLE) AS amount, " +
          "COALESCE(TRY_CAST(balance_str AS DOUBLE), 0.0) AS balance FROM r WHERE TRY_CAST(amount_str AS DOUBLE) IS NOT NULL) " +
          "SELECT event_type, round(sum(amount), 2) AS sum_amount, round(sum(balance), 2) AS sum_balance, count(*) AS n " +
          "FROM c GROUP BY event_type ORDER BY event_type"),
      "amount-unparseable drops the row, balance-unparseable keeps it with 0.0 — the reference's asymmetric validation"
    ) { (s, dir) =>
      table(s, dir, "events")
        .withColumn(
          "amount_str",
          when(col("event_type") === "error", lit("not-a-number"))
            .otherwise(col("value").cast("string")))
        .withColumn(
          "balance_str",
          when(col("event_type") === "view", lit(null).cast("string"))
            .otherwise(col("value").cast("string")))
        .withColumn("amount", graft.transform.Canonicalize.try_cast_double(col("amount_str")))
        .filter(col("amount").isNotNull)
        .withColumn(
          "balance",
          coalesce(graft.transform.Canonicalize.try_cast_double(col("balance_str")), lit(0.0)))
        .groupBy("event_type")
        .agg(
          round(sum("amount"), 2).as("sum_amount"),
          round(sum("balance"), 2).as("sum_balance"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ----- S6: synthetic generator, deterministic variant (synthetic/data.go:40-63) -----
    Q(
      "q19_synthetic_gen",
      Some(
        "SELECT 'SALE' AS details, " +
          "strftime(DATE '2024-01-01' + CAST(id % 365 AS INT), '%m/%d/%Y') AS posting_date, " +
          "'Synthetic transaction ' || CAST(id AS VARCHAR) AS description, " +
          "CAST(id * 9973 % 100000 AS DOUBLE) / 100.0 AS amount, " +
          "CAST(id * 6151 % 1000000 AS DOUBLE) / 100.0 AS balance, " +
          "'synthetic' AS category, 'DEBIT' AS txn_type, '' AS check_or_slip_num, " +
          "'synthetic' AS data_source, " +
          "lpad(CAST(id * 7919 % 10000 AS VARCHAR), 4, '0') AS account_id " +
          "FROM range(1000) t(id) ORDER BY description"),
      "spark.range generator — shuffle-free, embarrassingly parallel source"
    ) { (s, _) =>
      graft.source.Synthetic.transactionsDeterministic(s, 1000).orderBy("description")
    }
  )
}
