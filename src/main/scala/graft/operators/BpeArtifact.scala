package graft.operators

import org.apache.spark.sql.DataFrame

import graft.functions.BpeByteKit

/**
 * PORTABLE tokenizer artifact for the byte-level trainer — the published
 * `merges.txt` / `vocab.json` shape GPT-class runtimes load (the GPT-2 /
 * huggingface-tokenizers file convention, public knowledge):
 *
 *  - `merges.txt`: a `#version: 0.2` header, then one line per merge in
 *    GLOBAL TRAINING ORDER — the two sides' spellings in the printable
 *    byte-remap space ([[BpeByteKit.ByteToChar]]), separated by one
 *    space. Spellings can never contain a space (byte 0x20 remaps to
 *    U+0120 'Ġ'), so the line grammar is unambiguous.
 *  - `vocab.json`: spelling -> token id. Ids are the EXACT ids
 *    `bpe_encode_bytes` emits: the 256 single-byte tokens at their byte
 *    value, merge k at `256 + k - 1`.
 *
 * Export reads the model-sized merge table (one short row per merge —
 * the [[BpeInt.specOf]] collect discipline); import resolves each merge
 * line's sides by spelling against the vocabulary built so far (the
 * mechanism runtimes use to load these files) and emits the spec string
 * [[graft.functions.BpeEncodeBytes]] consumes — so an EXTERNALLY trained
 * merge list drives the same single-expression apply path. Both
 * directions fail loudly on the one case the file format cannot
 * represent: two token ids with the same surface spelling (distinct
 * merge trees, e.g. (a,bc) and (ab,c), can spell identically; a
 * spelling-keyed artifact is a bijection and cannot carry that model).
 *
 * Reference context: the reference engine has no tokenizer
 * (spark-2.4/…/BI5DataSource.scala:24); beyond-reference surface
 * (SURVEY.md §2.5).
 */
object BpeArtifact {

  /** The (midx, a, b) triples in merge order, contiguity-checked — one
    * bounded model-sized collect. */
  private def mergeTriples(merges: DataFrame): Array[(Int, Int, Int)] = {
    val ms = merges.select("midx", "a", "b").orderBy("midx")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    require(ms.nonEmpty, "BpeArtifact: empty merge table")
    ms.zipWithIndex.foreach { case ((midx, _, _), i) =>
      require(midx == i + 1,
        s"BpeArtifact: merge indices must be contiguous from 1, got $midx at $i")
    }
    ms
  }

  /** Remap-space spelling of every symbol id through the byte-level
    * merge table: single forward pass (merge k only references earlier
    * ids — enforced), returning ids 0..255 then the merges. */
  private def allSpellings(ms: Array[(Int, Int, Int)]): Array[String] = {
    val n = 256 + ms.length
    val out = new Array[String](n)
    var b = 0
    while (b < 256) { out(b) = String.valueOf(BpeByteKit.ByteToChar(b)); b += 1 }
    ms.foreach { case (midx, a, bSym) =>
      val id = 255 + midx
      require(a >= 0 && a < id && bSym >= 0 && bSym < id,
        s"BpeArtifact: merge $midx references undefined id ($a, $bSym) — " +
          "not a byte-level training-order merge table")
      out(id) = out(a) + out(bSym)
    }
    out
  }

  /** `merges.txt` content for a [[BpeByte.fitBlocked]] merge table. */
  def exportMerges(merges: DataFrame): String = {
    val ms = mergeTriples(merges)
    val sp = allSpellings(ms)
    val sb = new java.lang.StringBuilder("#version: 0.2\n")
    ms.foreach { case (_, a, b) =>
      sb.append(sp(a)).append(' ').append(sp(b)).append('\n')
    }
    sb.toString
  }

  /** `vocab.json` content: every token spelling -> the id
    * `bpe_encode_bytes` emits. Loud on duplicate spellings (the format
    * is spelling-keyed — see class doc). */
  def exportVocab(merges: DataFrame): String = {
    val sp = allSpellings(mergeTriples(merges))
    val seen = new java.util.HashMap[String, Integer]()
    val sb = new java.lang.StringBuilder("{")
    var id = 0
    while (id < sp.length) {
      val prev = seen.putIfAbsent(sp(id), id)
      require(prev == null,
        s"BpeArtifact.exportVocab: ids $prev and $id share spelling " +
          s"'${sp(id)}' — a spelling-keyed vocab.json cannot carry this model")
      if (id > 0) sb.append(',')
      sb.append('"').append(escapeJson(sp(id))).append("\":").append(id)
      id += 1
    }
    sb.append('}').toString
  }

  /** [[exportVocab]] plus SPECIAL TOKENS appended after the merges at
    * the next free ids — the GPT-2 convention (`<|endoftext|>` is the
    * LAST vocab id, 50256 = 256 + 50000 merges), and exactly the id
    * [[Packer.packTokenIds]] callers pass as `eosId` (vocab size of the
    * plain model + offset). Special spellings are used verbatim (they
    * are not remap-space byte spellings — runtimes match them as whole
    * strings before byte-level BPE runs); a special that collides with
    * a model spelling fails loudly. */
  def exportVocabWithSpecials(merges: DataFrame, specials: Seq[String]): String = {
    require(specials.nonEmpty, "BpeArtifact.exportVocabWithSpecials: no specials " +
      "given — use exportVocab")
    require(specials.distinct.length == specials.length,
      "BpeArtifact.exportVocabWithSpecials: duplicate special tokens")
    val sp = allSpellings(mergeTriples(merges))
    specials.foreach(s => require(!sp.contains(s),
      s"BpeArtifact.exportVocabWithSpecials: special '$s' collides with a " +
        "model spelling"))
    val base = exportVocab(merges)
    val sb = new java.lang.StringBuilder(base.substring(0, base.length - 1))
    var id = sp.length
    specials.foreach { s =>
      sb.append(",\"").append(escapeJson(s)).append("\":").append(id)
      id += 1
    }
    sb.append('}').toString
  }

  /** Remap space carries no control characters (bytes 0x00–0x20 all remap
    * above U+00FF), so JSON escaping is just the two structural chars. */
  private def escapeJson(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Parse a `merges.txt` (ours or an externally trained one) into the
    * spec string `bpe_encode_bytes`/`bpe_decode_bytes` consume. Each
    * line's sides resolve by spelling against the vocabulary built so
    * far — unknown spellings, malformed lines, ambiguous (duplicate)
    * spellings, and non-remap-space characters all fail loudly. */
  def importMerges(mergesTxt: String): String = {
    val bySpelling = new java.util.HashMap[String, Integer]()
    var b = 0
    while (b < 256) {
      bySpelling.put(String.valueOf(BpeByteKit.ByteToChar(b)), b)
      b += 1
    }
    val sb = new java.lang.StringBuilder
    var nextId = BpeByteKit.IdBase
    var lineNo = 0
    mergesTxt.split("\n", -1).foreach { raw =>
      lineNo += 1
      val line = if (raw.endsWith("\r")) raw.dropRight(1) else raw
      // Only the published header form is a comment: a first-line
      // "#version ...". '#' (0x23) remaps to itself, so a merge whose left
      // spelling starts with '#' is a legitimate data line — parse it.
      val isHeader = lineNo == 1 && line.startsWith("#version")
      if (line.nonEmpty && !isHeader) {
        val sp = line.indexOf(' ')
        require(sp > 0 && sp < line.length - 1 && line.indexOf(' ', sp + 1) < 0,
          s"BpeArtifact.importMerges: line $lineNo ('$line') is not " +
            "'<spelling> <spelling>' (spellings never contain spaces)")
        def resolve(spelling: String): Int = {
          val id = bySpelling.get(spelling)
          require(id != null,
            s"BpeArtifact.importMerges: line $lineNo references unknown " +
              s"spelling '$spelling' — merges must be in training order " +
              "over the byte alphabet")
          id
        }
        val a = resolve(line.substring(0, sp))
        val bSym = resolve(line.substring(sp + 1))
        if (sb.length > 0) sb.append(';')
        sb.append(a).append(':').append(bSym)
        val merged = line.substring(0, sp) + line.substring(sp + 1)
        val prev = bySpelling.putIfAbsent(merged, nextId)
        require(prev == null,
          s"BpeArtifact.importMerges: line $lineNo re-creates spelling " +
            s"'$merged' (first defined as id $prev) — ambiguous " +
            "spelling-keyed artifact")
        nextId += 1
      }
    }
    require(sb.length > 0, "BpeArtifact.importMerges: no merge lines found")
    sb.toString
  }
}
