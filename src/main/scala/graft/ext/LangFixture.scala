package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Planted Latin-script multilingual corpus for MODEL-based language
  * ID (`graft.ml.LangId`).
  *
  * The driver fixtures are English-ish word soup whatever their `lang`
  * column says, and [[UnicodeFixture]] separates SCRIPTS — neither can
  * exercise the detector a real multilingual crawl needs in hour one:
  * telling apart English/French/German/Spanish/Portuguese, which all
  * share Latin script and dominate web text. This module plants a
  * deterministic sentence bank per language and expands it into
  * train / held-out documents; the held-out docs are built ONLY from
  * sentences the training split never sees, so the driver-gated
  * accuracy measures generalization, not memorization.
  *
  * Expansion is purely combinatorial (ordered sentence pairs) — no
  * RNG anywhere, so every run, scale replica and engine sees the
  * byte-identical corpus. */
object LangFixture {

  /** Five Latin-script languages, fixed order (doc_id block order). */
  val langs: Seq[String] = Seq("en", "fr", "de", "es", "pt")

  /** Per-language sentence bank: first [[TrainBank]] sentences feed
    * the training expansion, the rest are held-out-only. Sentences
    * are function-word-rich running prose (what a char-n-gram model
    * actually keys on: articles, clitics, diacritic distributions —
    * not topic vocabulary, which is deliberately shared across the
    * languages so lexical overlap can't do the work). */
  val TrainBank = 10

  val banks: Map[String, Seq[String]] = Map(
    "en" -> Seq(
      "the model was trained on a large corpus of documents from the web",
      "we should check the quality of the data before training begins",
      "this is not the first time that the pipeline has failed quietly",
      "each document in the corpus has a language and a source field",
      "there are many ways to clean text but few of them are cheap",
      "the results of the evaluation were better than we had expected",
      "it is important to remove duplicates from the training data",
      "a good tokenizer should handle punctuation and numbers correctly",
      "they have been running the cluster for three days without errors",
      "when the job finishes the output is written to a shared table",
      "after the filters ran only half of the pages were kept for training",
      "you can measure the quality of a corpus by sampling documents",
      "most of the time the slowest stage is the shuffle between joins",
      "nothing in the report suggested that the data had been corrupted"),
    "fr" -> Seq(
      "le modèle a été entraîné sur un grand corpus de documents du web",
      "nous devons vérifier la qualité des données avant l'entraînement",
      "ce n'est pas la première fois que le pipeline échoue sans bruit",
      "chaque document du corpus possède une langue et une source",
      "il y a beaucoup de façons de nettoyer le texte mais peu sont rapides",
      "les résultats de l'évaluation étaient meilleurs que prévu",
      "il est important de supprimer les doublons des données d'entraînement",
      "un bon tokeniseur doit gérer la ponctuation et les nombres",
      "ils font tourner le cluster depuis trois jours sans erreur",
      "quand le travail se termine la sortie est écrite dans une table",
      "après les filtres seule la moitié des pages a été conservée",
      "on peut mesurer la qualité d'un corpus en échantillonnant des documents",
      "la plupart du temps l'étape la plus lente est le mélange entre jointures",
      "rien dans le rapport ne suggérait que les données étaient corrompues"),
    "de" -> Seq(
      "das modell wurde auf einem großen korpus von dokumenten trainiert",
      "wir sollten die qualität der daten vor dem training prüfen",
      "es ist nicht das erste mal dass die pipeline leise fehlschlägt",
      "jedes dokument im korpus hat eine sprache und eine quelle",
      "es gibt viele wege den text zu bereinigen aber wenige sind billig",
      "die ergebnisse der auswertung waren besser als wir erwartet hatten",
      "es ist wichtig duplikate aus den trainingsdaten zu entfernen",
      "ein guter tokenisierer muss zeichensetzung und zahlen beherrschen",
      "sie lassen den cluster seit drei tagen ohne fehler laufen",
      "wenn der job fertig ist wird die ausgabe in eine tabelle geschrieben",
      "nach den filtern wurde nur die hälfte der seiten behalten",
      "man kann die qualität eines korpus durch stichproben messen",
      "meistens ist die langsamste stufe das mischen zwischen den joins",
      "nichts im bericht deutete darauf hin dass die daten beschädigt waren"),
    "es" -> Seq(
      "el modelo fue entrenado con un gran corpus de documentos de la web",
      "debemos comprobar la calidad de los datos antes del entrenamiento",
      "no es la primera vez que la tubería falla sin hacer ruido",
      "cada documento del corpus tiene un idioma y una fuente",
      "hay muchas maneras de limpiar el texto pero pocas son baratas",
      "los resultados de la evaluación fueron mejores de lo esperado",
      "es importante eliminar los duplicados de los datos de entrenamiento",
      "un buen tokenizador debe manejar la puntuación y los números",
      "llevan tres días ejecutando el clúster sin ningún error",
      "cuando termina el trabajo la salida se escribe en una tabla",
      "después de los filtros solo se conservó la mitad de las páginas",
      "se puede medir la calidad de un corpus muestreando documentos",
      "la mayoría de las veces la etapa más lenta es la mezcla entre uniones",
      "nada en el informe sugería que los datos estuvieran corruptos"),
    "pt" -> Seq(
      "o modelo foi treinado com um grande corpus de documentos da web",
      "devemos verificar a qualidade dos dados antes do treinamento",
      "não é a primeira vez que o pipeline falha sem fazer barulho",
      "cada documento do corpus tem um idioma e uma fonte",
      "há muitas maneiras de limpar o texto mas poucas são baratas",
      "os resultados da avaliação foram melhores do que esperávamos",
      "é importante remover as duplicatas dos dados de treinamento",
      "um bom tokenizador deve lidar com a pontuação e os números",
      "eles estão executando o cluster há três dias sem nenhum erro",
      "quando o trabalho termina a saída é escrita numa tabela",
      "depois dos filtros apenas metade das páginas foi mantida",
      "pode-se medir a qualidade de um corpus amostrando documentos",
      "na maioria das vezes a etapa mais lenta é a mistura entre junções",
      "nada no relatório sugeria que os dados estivessem corrompidos"))

  require(banks.keySet == langs.toSet, "bank/lang mismatch")
  require(banks.values.forall(_.size == 14), "each bank has 14 sentences")
  require(banks.values.flatten.toSeq.distinct.size ==
    banks.values.map(_.size).sum, "duplicate sentence across banks")

  /** (doc_id, lang, split, text). Train docs: all ordered pairs of
    * DISTINCT train-bank sentences (90 per language). Held-out docs:
    * all ordered pairs of distinct held-out sentences (12 per
    * language) — zero sentence overlap with training. doc_id block:
    * 760000 + langIdx·1000 (+500 for held-out), clear of the 4xxxxx /
    * 6xxxxx / 70000x planted ranges. */
  val docs: Seq[(Long, String, String, String)] =
    langs.zipWithIndex.flatMap { case (lang, li) =>
      val bank = banks(lang)
      val (trainS, testS) = bank.splitAt(TrainBank)
      val train = for {
        a <- trainS.indices; b <- trainS.indices if a != b
      } yield (760000L + li * 1000 + a * trainS.size + b, lang, "train",
        s"${trainS(a)} ${trainS(b)}")
      val heldout = for {
        a <- testS.indices; b <- testS.indices if a != b
      } yield (760500L + li * 1000 + a * testS.size + b, lang, "heldout",
        s"${testS(a)} ${testS(b)}")
      train ++ heldout
    }

  require(docs.map(_._1).distinct.size == docs.size, "duplicate doc_id")
  require(docs.count(_._3 == "heldout") == langs.size * 12, "12 held-out/lang")

  /** The planted corpus as a DataFrame (doc_id, lang, split, text). */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "lang", "split", "text")
  }
}
