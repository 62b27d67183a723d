package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.HashExpressions._

/** SQL-function surface of the native hash/similarity expressions: the
  * same Catalyst nodes the Column API exposes, addressable from
  * `spark.sql(...)`. Two registration routes:
  *
  *  - deploy-time: `spark.sql.extensions=graft.engine.GraftExtensions`
  *    (config or `--conf`), applied when the session is created — the
  *    cluster path;
  *  - runtime: [[GraftFunctions.register]] on a session that already
  *    exists — the notebook/REPL path (temp functions, session-scoped).
  *
  * Structural parameters (minhash k, fingerprint window, hyperplane
  * table/planes) must be INTEGER LITERALS in the SQL: they are baked
  * into the generated code per expression instance, exactly as the
  * Column API takes them as Scala Ints.
  */
object GraftFunctions {

  private def intLit(args: Seq[Expression], i: Int, fn: String, what: String): Int =
    args(i) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $what (argument ${i + 1}) must be an integer literal, got $other")
    }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${args.length}")

  /** name → expression builder, the registry contract both routes share. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_fnv61" -> { args =>
      arity("graft_fnv61", args, 1); Fnv61(args.head)
    },
    "graft_minhash" -> { args =>
      arity("graft_minhash", args, 2)
      MinHashSignature(args.head, intLit(args, 1, "graft_minhash", "k"))
    },
    "graft_simhash64" -> { args =>
      arity("graft_simhash64", args, 1); SimHash64(args.head)
    },
    "graft_fingerprint" -> { args =>
      arity("graft_fingerprint", args, 2)
      RollingFingerprint(args.head, intLit(args, 1, "graft_fingerprint", "window"))
    },
    "graft_cosine" -> { args =>
      arity("graft_cosine", args, 2); CosineSimilarity(args(0), args(1))
    },
    "graft_hyperplane_sig" -> { args =>
      arity("graft_hyperplane_sig", args, 3)
      HyperplaneSignature(args.head,
        intLit(args, 1, "graft_hyperplane_sig", "table"),
        intLit(args, 2, "graft_hyperplane_sig", "nPlanes"))
    },
    "graft_char_stats" -> { args =>
      arity("graft_char_stats", args, 1); CharStats(args.head)
    },
    "graft_ngrams" -> { args =>
      arity("graft_ngrams", args, 2)
      NgramArray(args.head, intLit(args, 1, "graft_ngrams", "n"))
    },
    "graft_ngram_stats" -> { args =>
      arity("graft_ngram_stats", args, 2)
      NgramStats(args.head, intLit(args, 1, "graft_ngram_stats", "n"))
    },
    "graft_lang_scores" -> { args =>
      arity("graft_lang_scores", args, 1); LangScores(args.head)
    },
    "graft_int8_stats" -> { args =>
      arity("graft_int8_stats", args, 1); Int8Stats(args.head)
    },
    "graft_int8_codes" -> { args =>
      arity("graft_int8_codes", args, 1); Int8Codes(args.head)
    },
    "graft_long_dot" -> { args =>
      arity("graft_long_dot", args, 2); LongDot(args(0), args(1))
    },
    "graft_sql2" -> { args =>
      arity("graft_sql2", args, 2); SqL2F(args(0), args(1))
    },
    "graft_cosine_raw" -> { args =>
      arity("graft_cosine_raw", args, 2); CosineRaw(args(0), args(1))
    },
    "graft_long_eq_count" -> { args =>
      arity("graft_long_eq_count", args, 2); LongEqCount(args(0), args(1))
    })

  /** Register every graft function as a session-scoped temp function. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.FunctionBridge.registerTemp(spark, name, builder)
    }
}
