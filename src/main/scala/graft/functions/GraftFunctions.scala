package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.FunctionBridge
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the native expressions: every graft Catalyst expression
  * is registered under a SQL name, so `spark.sql("SELECT jaccard_sim(...)")`
  * works — for builder-time sessions via [[GraftExtensions]]
  * (`.withExtensions` / `spark.sql.extensions`), and for existing sessions
  * via [[GraftFunctions.register]]. This is the (c)-tier extension path of
  * the Spark-first design: compose built-ins where possible, native
  * expressions where not, and expose those to SQL users too.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** name → (builder, usage) for every native expression. */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("cosine_similarity",
      { args: Seq[Expression] =>
        require(args.length == 2, "cosine_similarity(vecA, vecB)")
        CosineSimilarity(args(0), args(1))
      },
      "cosine_similarity(vecA, vecB) - fused dot/norms cosine over float/double arrays"),
    ("jaccard_sim",
      { args: Seq[Expression] =>
        require(args.length == 2, "jaccard_sim(setA, setB)")
        JaccardSim(args(0), args(1))
      },
      "jaccard_sim(setA, setB) - exact Jaccard over distinct string arrays"),
    ("sorted_jaccard",
      { args: Seq[Expression] =>
        require(args.length == 2, "sorted_jaccard(sortedA, sortedB)")
        SortedJaccard(args(0), args(1))
      },
      "sorted_jaccard(sortedA, sortedB) - merge Jaccard over ascending long arrays"),
    ("simhash64",
      { args: Seq[Expression] =>
        require(args.length == 1, "simhash64(tokens)")
        SimHash64(args(0))
      },
      "simhash64(tokens) - 64-bit SimHash fingerprint of a token array"),
    ("minhash_sig",
      { args: Seq[Expression] =>
        require(args.length == 2 || args.length == 3, "minhash_sig(tokens, k[, w])")
        MinHashSig(args(0), intArg(args(1), "k"),
          if (args.length == 3) intArg(args(2), "w") else 3)
      },
      "minhash_sig(tokens, k[, w]) - k seeded-xxh64 minima over w-shingles"),
    ("hyperplane_sig",
      { args: Seq[Expression] =>
        require(args.length == 2 || args.length == 3, "hyperplane_sig(vec, nPlanes[, offset])")
        HyperplaneSig(args(0), intArg(args(1), "nPlanes"),
          if (args.length == 3) intArg(args(2), "offset") else 0)
      },
      "hyperplane_sig(vec, nPlanes[, offset]) - LSH bucket id from hyperplane signs"),
    ("distinct_shingles",
      { args: Seq[Expression] =>
        require(args.length == 1 || args.length == 2, "distinct_shingles(tokens[, w])")
        DistinctShingles(args(0), if (args.length == 2) intArg(args(1), "w") else 3)
      },
      "distinct_shingles(tokens[, w]) - distinct w-shingles, first-occurrence order"),
    ("jaro_sim",
      { args: Seq[Expression] =>
        require(args.length == 2, "jaro_sim(a, b)")
        JaroWinklerSim(args(0), args(1), winkler = false)
      },
      "jaro_sim(a, b) - byte-level Jaro similarity (DuckDB-pinned semantics)"),
    ("jaro_winkler_sim",
      { args: Seq[Expression] =>
        require(args.length == 2, "jaro_winkler_sim(a, b)")
        JaroWinklerSim(args(0), args(1), winkler = true)
      },
      "jaro_winkler_sim(a, b) - Jaro-Winkler similarity (0.1 weight, 4-byte prefix, >0.7 gate)"),
    ("damerau_levenshtein",
      { args: Seq[Expression] =>
        require(args.length == 2, "damerau_levenshtein(a, b)")
        DamerauLevenshtein(args(0), args(1))
      },
      "damerau_levenshtein(a, b) - unrestricted adjacent-transposition edit distance"),
    ("bottomk_pairs",
      { args: Seq[Expression] =>
        require(args.length == 3, "bottomk_pairs(ord, id, k)")
        BottomKPairs(args(0), args(1), intArg(args(2), "k"))
      },
      "bottomk_pairs(ord, id, k) - k smallest (ord, id) long pairs, merged map-side (O(groups*k) shuffle)"),
    // r18 (verdict ask #2): the hash-aggregable argmax/argmin on the SQL
    // surface. Without these a SQL user only has max_by/min_by — the
    // struct-buffered aggregates that silently degrade to SortAggregate
    // (the q179-r17 wall class the physical lint now flags). The analyzer
    // wraps a bare AggregateFunction in its AggregateExpression; implicit
    // casts widen integral args/scores, anything else fails analysis loudly.
    ("argmax",
      { args: Seq[Expression] =>
        require(args.length == 2, "argmax(arg, score)")
        ArgExtremum.widened(args(0), args(1), maximize = true)
      },
      "argmax(arg, score) - arg of the highest score, ties -> smallest arg; hash-aggregable (use instead of max_by)"),
    ("argmin",
      { args: Seq[Expression] =>
        require(args.length == 2, "argmin(arg, score)")
        ArgExtremum.widened(args(0), args(1), maximize = false)
      },
      "argmin(arg, score) - arg of the lowest score, ties -> smallest arg; hash-aggregable (use instead of min_by)"),
    // Spark ships these two as unregistered internal expressions (used only
    // by its InjectRuntimeFilter rule); surfacing them gives SQL users the
    // explicit runtime-filter path of plans.RuntimeFilter: build a bloom in
    // a scalar subquery, prune the fact scan with might_contain.
    ("bloom_filter_agg",
      { args: Seq[Expression] =>
        require(args.length == 1 || args.length == 2 || args.length == 3,
          "bloom_filter_agg(xxhash64(key)[, estItems[, numBits]])")
        args match {
          case Seq(c) => new BloomFilterAggregate(c)
          case Seq(c, n) => new BloomFilterAggregate(c, n)
          case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        }
      },
      "bloom_filter_agg(xxhash64(key)[, estItems[, numBits]]) - bloom filter of hashed keys as binary"),
    ("might_contain",
      { args: Seq[Expression] =>
        require(args.length == 2, "might_contain(bloom, xxhash64(key))")
        BloomFilterMightContain(args(0), args(1))
      },
      "might_contain(bloom, xxhash64(key)) - bloom membership probe; bloom must be constant or scalar subquery"))

  /** Register on an EXISTING session (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder, _) =>
      FunctionBridge.registerTemp(spark, name, builder)
    }

  /** Inject at session build time (SparkSessionExtensions). */
  def inject(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, builder, usage) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(s"graft.functions.$name", null, name, usage, ""),
        builder))
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
