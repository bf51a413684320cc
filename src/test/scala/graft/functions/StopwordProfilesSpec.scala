package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the invariants the q_html_extract_multi fixture leans on (see
  * [[StopwordProfiles]]'s scaladoc): a profile edit that breaks any of
  * these would silently un-pin the per-language stopword rule in the
  * hash gate, so they fail HERE first, with names.
  */
class StopwordProfilesSpec extends AnyFunSuite {

  private val table = StopwordProfiles.table
  private val byLang = table.toMap

  test("10 profiles, 10 distinct lowercase words each, no dup langs") {
    assert(table.size === 10)
    assert(table.map(_._1).distinct.size === 10)
    table.foreach { case (l, words) =>
      assert(words.size === 10, s"profile $l")
      assert(words.distinct.size === 10, s"profile $l has duplicate words")
      words.foreach(w => assert(w == w.toLowerCase(java.util.Locale.ROOT),
        s"profile $l word '$w' not lowercase"))
    }
  }

  test("en sentence is disjoint from every non-en profile (the cross-" +
      "language plant must fail exactly the stopword rule)") {
    val en = byLang("en").toSet
    table.filter(_._1 != "en").foreach { case (l, words) =>
      val overlap = words.toSet.intersect(en)
      assert(overlap.isEmpty, s"profile $l shares $overlap with en")
    }
  }

  test("de sentence is disjoint from the en profile (the plant for en docs)") {
    assert(byLang("de").toSet.intersect(byLang("en").toSet).isEmpty)
  }

  test("every profile sentence is 25..199 chars (kept by length, not by " +
      "the longChars escape, under the q_html_extract_multi thresholds)") {
    table.foreach { case (l, _) =>
      val n = StopwordProfiles.sentence(l).length
      assert(n >= 25 && n < 200, s"sentence($l) length $n")
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
