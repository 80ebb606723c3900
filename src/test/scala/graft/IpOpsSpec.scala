package graft

import org.apache.spark.sql.functions._

import graft.functions.IpCanon

/** CPython-ipaddress parity for the IPvAny* types (networks.py:1159-1302):
 * every SparkEntry.ipFixtures row — goldens generated with the stdlib
 * ipaddress module pydantic delegates to — must reproduce through the
 * native expression, through BOTH the static core (interpreter path) and
 * a DataFrame plan (codegen path). */
class IpOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("static core matches every CPython golden (addr/iface/net)") {
    SparkEntry.ipFixtures.foreach { case (in, addr, iface, net) =>
      assert(IpCanon.canon(in, IpCanon.ModeAddress) == addr,
        s"addr('$in')")
      assert(IpCanon.canon(in, IpCanon.ModeInterface) == iface,
        s"iface('$in')")
      assert(IpCanon.canon(in, IpCanon.ModeNetwork) == net, s"net('$in')")
    }
  }

  test("expression path (codegen) agrees with the static core") {
    val df = SparkEntry.ipFixtures.map(_._1).toDF("s")
    val out = df.select(col("s"), IpCanon.ipAddress(col("s")).as("a"),
      IpCanon.ipInterface(col("s")).as("i"), IpCanon.ipNetwork(col("s")).as("n"))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    SparkEntry.ipFixtures.foreach { case (in, addr, iface, net) =>
      assert(out(in) == ((addr, iface, net)), s"'$in'")
    }
    // null input stays null; non-string input is a type error, not a crash
    assert(Seq(Tuple1(null: String)).toDF("s")
      .select(IpCanon.ipAddress(col("s"))).collect().head.isNullAt(0))
  }

  test("property: canonical form is a fixpoint and re-parses to itself") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      // random hextets with zero-runs likely (favor zeros heavily)
      val hx = Array.fill(8)(
        if (rnd.nextInt(3) == 0) rnd.nextInt(0x10000) else 0)
      val scope = if (rnd.nextInt(4) == 0) "eth" + rnd.nextInt(9) else null
      val rendered = IpCanon.renderV6(IpCanon.V6(hx, scope))
      val back = IpCanon.parseV6(rendered)
      assert(back != null && back.hextets.sameElements(hx) &&
        back.scope == scope, rendered)
      // canon is idempotent through the public surface
      assert(IpCanon.canon(rendered, IpCanon.ModeAddress) == rendered)
      // and the /128 interface re-canonicalizes to itself too
      val iface = rendered + "/128"
      assert(IpCanon.canon(iface, IpCanon.ModeInterface) == iface)
    }
    (1 to 200).foreach { _ =>
      val o = Array.fill(4)(rnd.nextInt(256))
      val s = o.mkString(".")
      assert(IpCanon.canon(s, IpCanon.ModeAddress) == s)
      val p = rnd.nextInt(33)
      assert(IpCanon.canon(s"$s/$p", IpCanon.ModeInterface) == s"$s/$p")
    }
  }

  test("IpSpec: model field validation + pydantic error type + schema") {
    import graft.spec._
    import graft.compile.ModelValidator
    val m = ModelSpec("host", Seq(
      FieldSpec("ip", IpSpec()),
      FieldSpec("net", NullableSpec(IpSpec("network")))))
    val df = Seq(
      (1L, "2001:DB8::FF00:42:8329", "10.0.0.0/8"),
      (2L, "999.1.1.1", "1.2.3.4/24"),
      (3L, "127.0.0.1", null))
      .toDF("row_id", "ip", "net")
    val out = ModelValidator.plan(df, m).collect()
      .map(r => r.getAs[Long]("row_id") -> r).toMap
    assert(out(1L).getAs[String]("ip") == "2001:db8::ff00:42:8329")
    assert(out(1L).getAs[String]("net") == "10.0.0.0/8")
    assert(out(1L).getAs[Boolean](ModelValidator.VALID))
    val viols = out(2L).getSeq[org.apache.spark.sql.Row](
      out(2L).fieldIndex(ModelValidator.VIOLATIONS))
    assert(viols.map(_.getAs[String]("type")).sorted ==
      Seq("ip_any_address", "ip_any_network"))
    assert(viols.forall(_.getAs[String]("msg").startsWith(
      "value is not a valid IPv4 or IPv6")))
    assert(out(3L).getAs[Boolean](ModelValidator.VALID)) // nullable net
    // JSON Schema roundtrip keeps the pydantic ipvany* formats
    val once = JsonSchemaGen.toJson(m)
    assert(once.contains("\"ipvanyaddress\"") &&
      once.contains("\"ipvanynetwork\""))
    assert(JsonSchemaGen.toJson(JsonSchemaReader.fromJson(once)) == once)
  }
}
