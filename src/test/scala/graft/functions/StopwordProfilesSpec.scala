package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the invariants the q_html_extract_multi / q_warc_extract
  * fixtures lean on (see [[StopwordProfiles]]'s scaladoc): a profile or
  * plant edit that breaks any of these would silently un-pin the
  * per-language stopword rule in the hash gates, so they fail HERE
  * first, with names. Since r16 the lists are production-depth
  * (~50–100 words), so the cross-language disjointness is maintained
  * at the PLANT-SENTENCE level, not the profile level.
  */
class StopwordProfilesSpec extends AnyFunSuite {

  private val table = StopwordProfiles.table
  private val byLang = table.toMap
  private val plants = StopwordProfiles.plantWords

  test("10 profiles at production depth: >=50 distinct lowercase words " +
      "each, no dup langs, pre-r15 tie-break order") {
    assert(table.size === 10)
    assert(table.map(_._1) ===
      Seq("en", "de", "fr", "es", "it", "pt", "nl", "sv", "pl", "tr"))
    table.foreach { case (l, words) =>
      assert(words.size >= 50, s"profile $l only ${words.size} words")
      assert(words.distinct.size === words.size,
        s"profile $l duplicate words: " +
          words.diff(words.distinct).distinct.mkString(","))
      words.foreach(w => assert(w == w.toLowerCase(java.util.Locale.ROOT),
        s"profile $l word '$w' not lowercase"))
    }
  }

  test("every plant is 10 words drawn FROM its own profile (the " +
      "keep-plant must score 10/10)") {
    assert(plants.keySet === table.map(_._1).toSet)
    plants.foreach { case (l, ws) =>
      assert(ws.size === 10 && ws.distinct.size === 10, s"plant $l")
      val missing = ws.filterNot(byLang(l).contains)
      assert(missing.isEmpty, s"plant $l words $missing not in profile $l")
    }
  }

  test("en plant sentence is disjoint from every non-en profile (the " +
      "cross-language plant must fail exactly the stopword rule)") {
    val en = plants("en").toSet
    table.filter(_._1 != "en").foreach { case (l, words) =>
      val overlap = words.toSet.intersect(en)
      assert(overlap.isEmpty, s"profile $l shares $overlap with en plant")
    }
  }

  test("de plant sentence is disjoint from the en profile (the plant " +
      "for en docs)") {
    val overlap = plants("de").toSet.intersect(byLang("en").toSet)
    assert(overlap.isEmpty, s"en profile shares $overlap with de plant")
  }

  test("every plant sentence is 25..199 chars (kept by length, not by " +
      "the longChars escape, under the q_html_extract_multi thresholds)") {
    table.foreach { case (l, _) =>
      val n = StopwordProfiles.sentence(l).length
      assert(n >= 25 && n < 200, s"sentence($l) length $n")
    }
  }

  test("plant sentences are quote-free (dual-engine string literals)") {
    table.foreach { case (l, _) =>
      assert(!StopwordProfiles.sentence(l).contains("'"), s"sentence($l)")
    }
  }

  test("TextAnalysis.profiles and HtmlExtractImpl dispatch share this table") {
    assert(graft.operators.TextAnalysis.profiles eq StopwordProfiles.table)
    table.foreach { case (l, words) =>
      val hs = HtmlExtractImpl.profileSets.get(l)
      assert(hs != null, s"no dispatch set for $l")
      val got = {
        val it = hs.iterator(); val b = Set.newBuilder[String]
        while (it.hasNext) b += it.next()
        b.result()
      }
      assert(got === words.toSet, s"dispatch set for $l diverges")
    }
    assert(HtmlExtractImpl.stopwords eq HtmlExtractImpl.profileSets.get("en"))
  }
}
