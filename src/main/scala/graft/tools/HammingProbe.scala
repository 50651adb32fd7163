package graft.tools
import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.functions.Hashing
object HammingProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.operators.DocAssembly.assemble(spark, CorpusGen.transcripts(spark, 400L).toDF).collect()
    for (k <- Seq(2, 3)) {
      val sim = docs.map(d => d.conv_id -> Hashing.simhash(Hashing.shingleHashes(d.doc_text, k))).toMap
      import spark.implicits._
      val fuzzy = CorpusGen.truthPairs(spark, 400L).filter($"kind" === "fuzzy").collect()
      val ds = fuzzy.map(p => Hashing.hammingDistance(sim(p.doc_a), sim(p.doc_b)))
      // min over ALL non-truth pairs (brute force 400x400)
      def root(i: Long): Long = CorpusGen.family(i) match {
        case "exact"|"near"|"fuzzy" => CorpusGen.sourceIndex(i)
        case "mega" => 90L
        case _ => i }
      val ids = (0L until 400L)
      var minCross = 64; var crossUnder16 = 0
      for (i <- ids; j <- ids if j > i && root(i) != root(j)) {
        val d = Hashing.hammingDistance(sim(CorpusGen.convId(i)), sim(CorpusGen.convId(j)))
        if (d < minCross) minCross = d
        if (d <= 16) crossUnder16 += 1
      }
      println(s"k=$k fuzzy: ${ds.sorted.mkString(",")} | minCross=$minCross crossUnder16=$crossUnder16")
    }
    spark.stop()
  }
}
