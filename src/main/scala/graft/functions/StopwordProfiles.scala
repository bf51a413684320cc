package graft.functions

/** Per-language high-frequency function-word profiles — the canonical
  * table behind BOTH the language-ID / quality scoring operators
  * (`TextAnalysis.profiles` delegates here) and the profile-dispatched
  * HTML extraction stopword rule ([[HtmlExtractImpl]]). One table, one
  * source of truth: the DuckDB oracle IN-lists are machine-generated
  * from it, so the engine and the oracle cannot drift.
  *
  * Lists are public standard function words (the jusText / NLTK
  * stopword-list family — jusText ships ~30 such profiles; these are
  * the 10-word heads). Order is the language tie-break order for
  * argmax scoring (first listed wins), so "en".."es" keep their
  * pre-r15 positions and semantics.
  *
  * Fixture discipline (q_html_extract_multi): the cross-language plant
  * for a document of language L is a sentence that must fail the
  * stopword rule under L — which requires the planted sentence to
  * share ZERO words with L's profile. The English sentence is the
  * plant for every L != en (each other profile is disjoint from the en
  * word set — "to" was deliberately left out of "pl" for this) and the
  * German sentence is the plant for en (the de words are disjoint from
  * the en profile); StopwordProfilesSpec asserts both disjointness
  * invariants so a profile edit cannot silently un-pin the rule.
  */
object StopwordProfiles {

  val table: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "was"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ich", "ist", "du", "sich", "wir"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du", "je"),
    "es" -> Seq("el", "los", "de", "que", "y", "en", "un", "ser", "se", "no"),
    "it" -> Seq("di", "che", "il", "non", "per", "con", "del", "come", "sono", "anche"),
    "pt" -> Seq("o", "da", "do", "em", "um", "para", "com", "os", "mais", "como"),
    "nl" -> Seq("het", "een", "van", "ik", "te", "dat", "op", "ze", "aan", "met"),
    "sv" -> Seq("och", "att", "det", "som", "på", "är", "av", "för", "med", "har"),
    "pl" -> Seq("nie", "na", "do", "jest", "ale", "jak", "po", "co", "tak", "od"),
    "tr" -> Seq("bir", "ve", "bu", "da", "ne", "ben", "ama", "gibi", "daha", "ile"))

  val langs: Seq[String] = table.map(_._1)

  /** The per-language space-joined profile sentence — the
    * q_html_extract_multi keep-plant (stopword ratio 10/10 under its
    * own profile); the en (or, for en documents, de) sentence doubles
    * as the fails-only-the-stopword-rule cross-language plant.
    */
  def sentence(lang: String): String =
    table.toMap.apply(lang).mkString(" ")
}
