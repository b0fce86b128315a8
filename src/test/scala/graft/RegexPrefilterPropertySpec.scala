package graft

import graft.plans.RegexPrefilter
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Soundness of the literal-prefilter extraction, property-checked: for
  * any generated pattern, EVERY text the regex matches must contain the
  * extracted mandatory literal — otherwise the injected Contains
  * prefilter would silently drop matching rows (the failure mode of
  * treating optional-group or class content as mandatory). The generator
  * constructs a matching text per pattern by realizing each token, so
  * the property is exercised on guaranteed matches rather than waiting
  * for random strings to hit a regex.
  */
class RegexPrefilterPropertySpec extends AnyFunSuite {

  // one regex token and a realization that matches it
  private sealed trait Tok { def re: String; def sample: Gen[String] }
  private case class Lit(s: String) extends Tok {
    def re = s; def sample = Gen.const(s)
  }
  private case object Dot extends Tok {
    def re = "."; def sample = Gen.oneOf("a", "b", "z")
  }
  private case class Star(c: Char) extends Tok {
    def re = s"$c*"; def sample = Gen.choose(0, 3).map(c.toString * _)
  }
  private case class Plus(c: Char) extends Tok {
    def re = s"$c+"; def sample = Gen.choose(1, 3).map(c.toString * _)
  }
  private case class OptChar(c: Char) extends Tok {
    def re = s"$c?"; def sample = Gen.oneOf("", c.toString)
  }
  private case class Clazz(cs: String) extends Tok {
    def re = s"[$cs]"; def sample = Gen.oneOf(cs.map(_.toString))
  }
  private case class OptGroup(s: String) extends Tok {
    def re = s"($s)?"; def sample = Gen.oneOf("", s)
  }
  private case class AltGroup(a: String, b: String) extends Tok {
    def re = s"($a|$b)"; def sample = Gen.oneOf(a, b)
  }
  private case class Rep(c: Char, lo: Int, hi: Int) extends Tok {
    def re = s"$c{$lo,$hi}"
    def sample = Gen.choose(lo, hi).map(c.toString * _)
  }

  private val litGen: Gen[String] =
    Gen.choose(1, 5).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a' to 'f')))

  private val tokGen: Gen[Tok] = Gen.frequency(
    5 -> litGen.map(Lit),
    1 -> Gen.const(Dot),
    1 -> Gen.oneOf('a' to 'f').map(Star),
    1 -> Gen.oneOf('a' to 'f').map(Plus),
    1 -> Gen.oneOf('a' to 'f').map(OptChar),
    1 -> Gen.someOf('a' to 'f').suchThat(_.nonEmpty).map(cs => Clazz(cs.mkString)),
    1 -> litGen.map(OptGroup),
    1 -> Gen.zip(litGen, litGen).map { case (a, b) => AltGroup(a, b) },
    1 -> Gen.zip(Gen.oneOf('a' to 'f'), Gen.choose(0, 2))
      .map { case (c, lo) => Rep(c, lo, lo + 2) })

  private val caseGen: Gen[(String, String)] = for {
    toks <- Gen.nonEmptyListOf(tokGen).map(_.take(6))
    parts <- Gen.sequence[List[String], String](toks.map(_.sample))
    prefix <- Gen.stringOfN(2, Gen.oneOf('x', 'y'))
    suffix <- Gen.stringOfN(2, Gen.oneOf('x', 'y'))
  } yield (toks.map(_.re).mkString, prefix + parts.mkString + suffix)

  test("every text a pattern matches contains the extracted mandatory literal") {
    val params = Gen.Parameters.default
    (0 until 500).foreach { i =>
      val (pattern, text) = caseGen.pureApply(params, Seed(i.toLong * 104729 + 7))
      // generator sanity: the realized text really matches (find semantics,
      // same as Spark's RLike)
      assert(java.util.regex.Pattern.compile(pattern).matcher(text).find(),
        s"generator bug: '$text' !~ /$pattern/")
      RegexPrefilter.mandatoryLiteral(pattern).foreach { lit =>
        assert(text.contains(lit),
          s"UNSOUND: /$pattern/ matched '$text' but prefilter literal '$lit' absent")
      }
      // DNF soundness: some alternative must have ALL its literals present
      RegexPrefilter.literalDnf(pattern).foreach { dnf =>
        assert(dnf.exists(conj => conj.forall(text.contains)),
          s"UNSOUND DNF: /$pattern/ matched '$text' but no alternative " +
            s"holds: $dnf")
      }
    }
  }

  test("known shapes: only mandatory runs donate literals") {
    // optional group is True; its mandatory neighbor still extracts
    assert(RegexPrefilter.mandatoryLiteral("(abc)?xyz") == Some("xyz"))
    assert(RegexPrefilter.mandatoryLiteral("ab[x-z]cd").isEmpty)
    assert(RegexPrefilter.mandatoryLiteral("abc|def").isEmpty)
    assert(RegexPrefilter.mandatoryLiteral("abc\\d").isEmpty)
    assert(RegexPrefilter.mandatoryLiteral("abcd.*efg") == Some("abcd"))
    // char before a quantifier is optional and must be excluded
    assert(RegexPrefilter.mandatoryLiteral("abcx*def") == Some("abc"))
    // counted-quantifier contents are syntax, not literals (property-found
    // bug: '2,4' used to be extracted as the mandatory literal)
    assert(RegexPrefilter.mandatoryLiteral("a+a*dde{2,4}b?e+").isEmpty)
    assert(RegexPrefilter.mandatoryLiteral("abc.{0,5}defg") == Some("defg"))
  }
}
