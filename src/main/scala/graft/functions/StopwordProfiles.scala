package graft.functions

/** Per-language high-frequency function-word profiles — the canonical
  * table behind BOTH the language-ID / quality scoring operators
  * (`TextAnalysis.profiles` delegates here) and the profile-dispatched
  * HTML extraction stopword rule ([[HtmlExtractImpl]]) plus the WARC
  * ingest oracle. One table, one source of truth: the DuckDB oracle
  * IN-lists are machine-generated from it, so the engine and the
  * oracle cannot drift.
  *
  * Lists are public standard function words (the NLTK / stopwords-iso
  * / jusText list family), ~50–100 words per language since r16 (r15
  * carried 10-word heads; jusText ships ~30 languages at comparable
  * depth — production depth changes keep/drop decisions on real
  * mixed-register pages). Order is the language tie-break order for
  * argmax scoring (first listed wins), so "en".."es" keep their
  * pre-r15 positions and semantics.
  *
  * Fixture discipline (q_html_extract_multi / q_warc_extract): the
  * keep-plant for a document of language L is [[sentence]](L) — TEN
  * CURATED words drawn FROM L's profile (stopword ratio 10/10 under
  * its own profile), no longer the profile head: at r16 depth the full
  * lists legitimately overlap across languages (de "was", nl "is", pl
  * "to"), so the cross-language disjointness the plants rely on is
  * maintained at the SENTENCE level, not the profile level. The
  * invariants (all asserted by StopwordProfilesSpec so a profile edit
  * cannot silently un-pin a rule):
  *
  *  - plant(L) ⊆ profile(L) — the keep-plant scores 10/10;
  *  - plant(en) ∩ profile(L) = ∅ for every L ≠ en — the en sentence is
  *    the fails-only-the-stopword-rule cross plant for every non-en
  *    document (its words are distinctly English: the/you/that/…);
  *  - plant(de) ∩ profile(en) = ∅ — the de sentence is the cross plant
  *    for en documents;
  *  - every sentence is 25..199 chars (kept by length, not longChars).
  */
object StopwordProfiles {

  val table: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(
      "the", "and", "of", "to", "in", "is", "you", "that", "it", "was",
      "i", "me", "my", "we", "our", "ours", "your", "yours", "he", "him",
      "his", "she", "her", "its", "they", "them", "their", "what", "which",
      "who", "whom", "this", "these", "those", "am", "are", "were", "be",
      "been", "being", "have", "has", "had", "do", "does", "did", "a",
      "an", "but", "if", "or", "because", "as", "at", "by", "for", "with",
      "about", "into", "through", "from", "out", "on", "off", "not", "so",
      "than", "too", "very", "can", "will", "just", "would", "there",
      "when", "where", "why", "how", "all", "any", "both", "each", "more",
      "most", "other", "some", "such", "no", "nor", "only", "own", "same",
      "then", "once", "here", "again", "further", "should", "now"),
    "de" -> Seq(
      "der", "die", "und", "das", "nicht", "ich", "ist", "du", "sich",
      "wir", "aber", "alle", "als", "also", "am", "an", "auch", "auf",
      "aus", "bei", "bin", "bis", "bist", "da", "damit", "dann", "den",
      "des", "dem", "dass", "dein", "deine", "dich", "dir", "durch",
      "ein", "eine", "einem", "einen", "einer", "eines", "er", "es",
      "für", "hatte", "haben", "hab", "ihr", "ihre", "im", "ja", "jede",
      "jedem", "jeden", "jeder", "jedes", "kann", "können", "mein",
      "mit", "muss", "nach", "noch", "nun", "nur", "ob", "oder", "ohne",
      "sehr", "sein", "seine", "sie", "sind", "über", "um", "uns",
      "unter", "viel", "vom", "von", "vor", "wann", "war", "was",
      "weiter", "wenn", "wer", "wie", "wieder", "wird", "wo", "zu",
      "zum", "zur"),
    "fr" -> Seq(
      "le", "la", "et", "les", "des", "est", "un", "une", "du", "je",
      "au", "aux", "avec", "ce", "ces", "dans", "de", "elle", "en",
      "eux", "il", "ils", "leur", "lui", "ma", "mais", "me",
      "même", "mes", "moi", "mon", "ne", "nos", "notre", "nous", "on",
      "ou", "par", "pas", "pour", "qu", "que", "qui", "sa", "se", "ses",
      "son", "sur", "ta", "te", "tes", "toi", "ton", "tu", "vos",
      "votre", "vous", "suis", "es", "sommes", "êtes", "sont", "sera",
      "était", "été", "cette", "cet", "comme", "plus", "tout", "bien",
      "sans", "peut", "deux", "elles", "ainsi", "alors", "après",
      "autre", "avant", "chez", "donc", "encore", "entre", "faire",
      "fait", "faut", "ici", "leurs", "moins", "mois", "très", "vers"),
    "es" -> Seq(
      "el", "los", "de", "que", "y", "en", "un", "ser", "se", "no",
      "la", "a", "del", "las", "por", "para", "con", "una", "su", "al",
      "lo", "como", "más", "pero", "sus", "le", "ya", "o", "este", "sí",
      "porque", "esta", "entre", "cuando", "muy", "sin", "sobre",
      "también", "me", "hasta", "hay", "donde", "quien", "desde",
      "todo", "nos", "durante", "todos", "uno", "les", "ni", "contra",
      "otros", "ese", "eso", "ante", "ellos", "e", "esto", "mí",
      "antes", "algunos", "qué", "unos", "yo", "otro", "otras", "otra",
      "él", "tanto", "esa", "estos", "mucho", "quienes", "nada",
      "muchos", "cual", "poco", "ella", "estar", "estas", "algunas",
      "algo", "nosotros", "mi", "mis", "tú", "te", "ti", "tu", "tus",
      "es", "son", "fue", "era", "están"),
    "it" -> Seq(
      "di", "che", "il", "non", "per", "con", "del", "come", "sono",
      "anche", "ad", "al", "allo", "ai", "agli", "alla", "alle", "col",
      "coi", "da", "dal", "dallo", "dai", "dagli", "dalla", "dalle",
      "dello", "dei", "degli", "della", "delle", "nel", "nello", "nei",
      "negli", "nella", "nelle", "su", "sul", "sullo", "sui", "sugli",
      "sulla", "sulle", "tra", "contro", "io", "tu", "lui", "lei",
      "noi", "voi", "loro", "mio", "mia", "miei", "mie", "tuo", "tua",
      "tuoi", "tue", "suo", "sua", "suoi", "sue", "nostro", "nostra",
      "e", "ed", "se", "più", "quale", "quanto", "una", "un", "uno",
      "ma", "la", "le", "li", "lo", "gli", "era", "già", "quindi",
      "questo", "questa", "questi", "queste", "quello", "quella",
      "essere", "ha", "hanno", "perché", "dove", "cui", "ci", "ne"),
    "pt" -> Seq(
      "o", "da", "do", "em", "um", "para", "com", "os", "mais", "como",
      "de", "a", "que", "e", "é", "não", "uma", "no", "se", "na",
      "por", "as", "dos", "mas", "foi", "ao", "ele", "das", "tem", "à",
      "seu", "sua", "ou", "quando", "muito", "há", "nos", "já", "está",
      "eu", "também", "só", "pelo", "pela", "até", "isso", "ela",
      "entre", "era", "depois", "sem", "mesmo", "aos", "ter", "seus",
      "quem", "nas", "me", "esse", "eles", "estão", "você", "tinha",
      "foram", "essa", "num", "nem", "suas", "meu", "às", "minha",
      "têm", "numa", "pelos", "elas", "havia", "seja", "qual", "nós",
      "lhe", "deles", "essas", "esses", "pelas", "este", "fosse",
      "dele"),
    "nl" -> Seq(
      "het", "een", "van", "ik", "te", "dat", "op", "ze", "aan", "met",
      "de", "en", "die", "in", "hij", "niet", "zijn", "is", "was",
      "als", "voor", "had", "er", "maar", "om", "hem", "dan", "zou",
      "of", "wat", "mijn", "men", "dit", "zo", "door", "over", "zich",
      "bij", "ook", "tot", "je", "mij", "uit", "daar", "haar", "naar",
      "heb", "hoe", "heeft", "hebben", "deze", "u", "want", "nog",
      "zal", "zij", "nu", "geen", "omdat", "iets", "worden", "toch",
      "al", "waren", "veel", "meer", "doen", "toen", "moet", "ben",
      "zonder", "kan", "hun", "dus", "alles", "onder", "ja", "eens",
      "hier", "wie", "werd", "altijd", "wordt", "kunnen", "ons",
      "zelf", "tegen", "na", "reeds", "wil", "kon", "niets", "uw",
      "iemand", "geweest", "wel"),
    "sv" -> Seq(
      "och", "att", "det", "som", "på", "är", "av", "för", "med",
      "har", "i", "en", "jag", "hon", "han", "den", "var", "sig",
      "så", "till", "men", "ett", "om", "hade", "icke", "mig", "du",
      "henne", "då", "sin", "nu", "inte", "hans", "honom", "skulle",
      "hennes", "där", "min", "man", "ej", "vid", "kunde", "något",
      "från", "ut", "när", "efter", "upp", "vi", "dem", "vara", "vad",
      "över", "än", "dig", "kan", "sina", "här", "ha", "mot", "alla",
      "under", "någon", "eller", "allt", "mycket", "sedan", "ju",
      "denna", "själv", "detta", "åt", "utan", "varit", "hur",
      "ingen", "mitt", "ni", "bli", "blev", "oss", "din", "dessa",
      "några", "deras", "blir", "mina", "samma", "vilken", "vår",
      "blivit", "dess", "inom", "mellan", "varför", "varje", "vilka"),
    "pl" -> Seq(
      "nie", "na", "do", "jest", "ale", "jak", "po", "co", "tak",
      "od", "i", "w", "się", "z", "że", "o", "czy", "tylko", "przez",
      "już", "ma", "może", "mnie", "bardzo", "jego", "jej", "ich",
      "tym", "tego", "przy", "będzie", "było", "był", "być", "dla",
      "go", "kiedy", "które", "który", "która", "lub", "mi", "moje",
      "nad", "nam", "nas", "nic", "nich", "niż", "oraz", "pod", "sam",
      "są", "ten", "też", "we", "więc", "wszystko", "jeszcze", "to",
      "ta", "te", "gdy", "gdzie", "im", "ja", "ją", "je", "jednak",
      "mają", "mój", "mu", "można", "musi", "nigdy", "albo", "bez",
      "bo", "byli", "była", "ci", "cię", "dwa", "inne", "każdy",
      "lat", "miał", "między", "nawet", "niej", "nim", "pan", "potem",
      "swoje", "temu", "tu"),
    "tr" -> Seq(
      "bir", "ve", "bu", "da", "ne", "ben", "ama", "gibi", "daha",
      "ile", "acaba", "aslında", "az", "bazı", "belki", "biri",
      "birkaç", "birşey", "biz", "çok", "çünkü", "de", "defa", "diye",
      "eğer", "en", "hem", "hep", "hepsi", "her", "hiç", "için",
      "ise", "kez", "ki", "kim", "mı", "mu", "mü", "nasıl", "neden",
      "nerde", "nerede", "nereye", "niçin", "niye", "o", "sanki",
      "şey", "siz", "şu", "tüm", "veya", "ya", "yani", "sen", "onlar",
      "bunu", "bana", "beni", "benim", "bizim", "sizin", "onun",
      "ona", "onu", "şimdi", "sonra", "önce", "kadar", "artık",
      "başka", "bütün", "böyle", "şöyle", "yok", "var", "mi", "vardı",
      "olan", "olarak", "oldu", "olduğu", "üzere", "iki", "kendi",
      "değil", "hangi", "diğer"))

  val langs: Seq[String] = table.map(_._1)

  /** The curated 10-word keep-plant per language (⊆ its profile; see
    * the invariants above). en and de double as the cross-language
    * plants, so their words are chosen to be distinctly their own.
    */
  val plantWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "you", "that", "this", "they", "their", "would",
      "there", "which", "have"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ich", "ist", "du",
      "sich", "wir"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du",
      "je"),
    "es" -> Seq("el", "los", "de", "que", "y", "en", "un", "ser", "se",
      "no"),
    "it" -> Seq("di", "che", "il", "non", "per", "con", "del", "come",
      "sono", "anche"),
    "pt" -> Seq("o", "da", "do", "em", "um", "para", "com", "os", "mais",
      "como"),
    "nl" -> Seq("het", "een", "van", "ik", "te", "dat", "op", "ze",
      "aan", "met"),
    "sv" -> Seq("och", "att", "det", "som", "på", "är", "av", "för",
      "med", "har"),
    "pl" -> Seq("nie", "na", "do", "jest", "ale", "jak", "po", "co",
      "tak", "od"),
    "tr" -> Seq("bir", "ve", "bu", "da", "ne", "ben", "ama", "gibi",
      "daha", "ile"))

  /** The per-language space-joined plant sentence — the
    * q_html_extract_multi / q_warc_extract keep-plant (stopword ratio
    * 10/10 under its own profile); the en (or, for en documents, de)
    * sentence doubles as the fails-only-the-stopword-rule
    * cross-language plant.
    */
  def sentence(lang: String): String = plantWords(lang).mkString(" ")
}
