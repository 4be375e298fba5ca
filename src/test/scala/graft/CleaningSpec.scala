package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Cleaning

/** Golden tests ported verbatim from the reference
  * (`tests/tests_regex.py:6-25` + `tests/export.csv:1-14`), plus
  * property tests over the cleaning chain. */
class CleaningSpec extends AnyFunSuite {

  val golden: Seq[(String, String)] = Seq(
    ("virgin media cd 5347 deb", "virgin media cd 5347 deb"),
    ("the works cd 5347 deb", "the works cd 5347 deb"),
    ("paypal *microsoft cd 5347 14sep19 deb", "paypal microsoft cd 5347 deb"),
    ("costa @ next  cd 5347 deb", "costa next cd 5347 deb"),
    ("amznfreetime cd 5347 deb", "amznfreetime cd 5347 deb"),
    ("paypal *littleclub cd 5347 deb", "paypal littleclub cd 5347 deb"),
    ("co-op group  cd 5347 deb", "co op group cd 5347 deb"),
    ("paypal *helixdigit cd 5347 deb", "paypal helixdigit cd 5347 deb"),
    ("itunes.com/bill cd 5347 13oct19 deb", "itunes com bill cd 5347 deb"),
    ("national trust cd 5347 29dec19 deb", "national trust cd 5347 deb"),
    ("national trust cd 5347 deb", "national trust cd 5347 deb"),
    ("paypal *microsoft cd 5347 deb", "paypal microsoft cd 5347 deb"),
    ("co-op group  cd 5347 28sep19 deb", "co op group cd 5347 deb"),
    ("virgin media cd 5347 deb", "virgin media cd 5347 deb"),
  )

  test("14 reference golden rows (tests/export.csv) pass through cleanText") {
    golden.foreach { case (original, expected) =>
      assert(Cleaning.cleanText(original) == expected,
        s"for input '$original'")
    }
  }

  test("date/time scrubber removes numeric and wordy dates") {
    val cases = Seq(
      "pay 2021-09-14 ref",
      "pay 14/09/2021 ref",
      "pay 14.09.2021 ref",
      "pay 14 september 2021 ref",
      "pay sep 14 ref",
      "pay 14sep19 ref",
      "pay 1st january 2020 ref",
      "pay 12:30 ref",
      "pay 12:30:45 pm ref",
      "pay xx/xx/2021 ref",
    )
    cases.foreach { c =>
      val out = Cleaning.stripDates(c)
      assert(!out.matches(""".*(\d{4}|sep|january|:\d\d).*"""), s"'$c' -> '$out'")
    }
  }

  test("cleaning is idempotent (after trim)") {
    golden.foreach { case (original, _) =>
      val once = Cleaning.cleanText(original).trim
      assert(Cleaning.cleanText(once).trim == once)
    }
  }

  test("cleaned output alphabet is [a-zA-Z0-9 ]") {
    val rng = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 &()*@-./,:"
    (1 to 200).foreach { _ =>
      val s = Seq.fill(rng.nextInt(60))(alphabet(rng.nextInt(alphabet.length))).mkString
      assert(Cleaning.cleanText(s).forall(ch => ch.isLetterOrDigit || ch == ' '), s"input '$s'")
    }
  }
}
