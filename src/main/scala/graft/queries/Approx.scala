package graft.queries

import graft.{Q, Tables => T}
import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Declared-but-oracle-free operators (driver records a rows-only check):
  * sketch-based dedup/similarity and HLL distinct. Deterministic by
  * construction (fixed hash constants) — unit/property tests in
  * SketchesSpec pin the semantics.
  */
object Approx {

  val defs: Map[String, Q] = Map(

    "dedup_minhash" -> Q.noOracle { (s, d) =>
      Sketches.minhashNearDups(T.documents(s, d).select("doc_id", "text"),
          threshold = 0.5)
        .orderBy("id1", "id2")
    },

    "dedup_simhash" -> Q.noOracle { (s, d) =>
      Sketches.simhashNearDups(T.documents(s, d).select("doc_id", "text"),
          maxHamming = 3)
        .orderBy("id1", "id2")
    },

    "sim_ann_lsh" -> Q.noOracle { (s, d) =>
      // ANN top-20 most-similar pairs via sign-LSH buckets — the scale
      // path replacing sim_cosine_topk's exact pair join.
      Sketches.annPairs(T.embeddings(s, d), nbits = 4, tables = 16)
        .orderBy(col("sim").desc, col("id1"), col("id2"))
        .limit(20)
    },

    "sim_ann_ivf" -> Q.noOracle { (s, d) =>
      // IVF-cell ANN top-20 pairs — the coarse-quantizer scale path.
      graft.ops.IvfIndex.annPairs(T.embeddings(s, d), k = 16, nProbe = 2)
        .orderBy(col("sim").desc, col("id1"), col("id2"))
        .limit(20)
    },

    "text_fingerprint" -> Q.noOracle { (s, d) =>
      T.documents(s, d)
        .select(col("doc_id"), Sketches.fingerprints("text").as("fps"))
        .select(col("doc_id"), size(col("fps")).as("n_fp"),
          array_min(col("fps")).as("min_fp"), array_max(col("fps")).as("max_fp"))
        .orderBy("doc_id")
    },

    "agg_approx_distinct" -> Q.noOracle { (s, d) =>
      // HLL++ sketch — not oracle-stable by nature (SURVEY §2.4), but
      // deterministic for a fixed dataset + rsd, so rows-only is safe.
      T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .orderBy("l_returnflag")
    }
  )
}
