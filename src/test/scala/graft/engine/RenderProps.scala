package graft.engine

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the A14 JS-number renderer: whatever notation
  * `jsNumber` picks, the printed string must parse back to the EXACT
  * same double (the round-trip law JS `String(value)` satisfies), and
  * the notation rules must hold (no trailing ".0" on integral values,
  * exponent form only outside JS's fixed range). */
object RenderProps extends Properties("Render.jsNumber") {

  private val finiteDouble: Gen[Double] = Gen.oneOf(
    // uniform over bit patterns — exercises subnormals/extremes
    Gen.long.map(java.lang.Double.longBitsToDouble),
    // everyday magnitudes
    Gen.chooseNum(-1e9, 1e9),
    // integral values, incl. beyond-int range
    Gen.chooseNum(-9e15, 9e15).map(math.rint),
    // tiny magnitudes around the 1e-6 notation boundary
    Gen.chooseNum(-12, 12).flatMap(e =>
      Gen.chooseNum(1.0, 9.999).map(m => m * math.pow(10, e))))
    .retryUntil(d => !d.isNaN && !d.isInfinite)

  property("round-trip: parse(jsNumber(d)) == d exactly") =
    Prop.forAll(finiteDouble) { d =>
      java.lang.Double.parseDouble(Render.jsNumber(d)) == d ||
        (d == 0.0 && Render.jsNumber(d) == "0") // -0.0 prints "0" like JS
    }

  property("integral values below 1e21 have no decimal point") =
    Prop.forAll(Gen.chooseNum(-9e15, 9e15).map(math.rint)) { d =>
      val s = Render.jsNumber(d)
      !s.contains('.') && !s.contains('e') && !s.contains('E')
    }

  property("exponent notation only outside [1e-6, 1e21)") =
    Prop.forAll(finiteDouble) { d =>
      val a = math.abs(d)
      val s = Render.jsNumber(d)
      if (a == 0.0 || (a >= 1e-6 && a < 1e21)) !s.contains('e')
      else s.contains('e')
    }
}
