package graft.lake

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties (SURVEY.md §5.2 item 2): the x-ms-properties
  * wire-format encoder round-trips arbitrary key/value maps (values may
  * contain the separators — base64 guards them, mirroring the DFS API),
  * and path normalization is idempotent. */
object LakePropsProperties extends Properties("LakeProps") {

  private val keyGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val valGen = Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)
  private val propsGen: Gen[Map[String, String]] =
    Gen.mapOf(Gen.zip(keyGen, valGen))

  property("encode/decode round-trips any properties map") =
    Prop.forAll(propsGen) { props =>
      LakeClient.decodeProps(LakeClient.encodeProps(props)) == props
    }

  property("values with = , and newlines survive") =
    Prop.forAll(keyGen, Gen.oneOf("a=b", "x,y", "a\nb", "=,=", "")) { (k, v) =>
      LakeClient.decodeProps(LakeClient.encodeProps(Map(k -> v))) == Map(k -> v)
    }

  property("encoding is deterministic regardless of map ordering") =
    Prop.forAll(propsGen) { props =>
      LakeClient.encodeProps(props) ==
        LakeClient.encodeProps(props.toSeq.reverse.toMap)
    }
}
