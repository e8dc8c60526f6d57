package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference's Northwind fast-path expectations, asserted row-for-row
  * (`/root/reference/pkg/cypher/northwind_fastpaths_test.go`).
  */
class NorthwindSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(name: String): Seq[Seq[Any]] =
    QueryRegistry.queryFns(name)(spark, sf)
      .collect().map(_.toSeq.toSeq).toSeq

  test("supplier to category through products") {
    val got = rows("q_nw_supplier_category")
      .map(r => ((r(0), r(1)), r(2))).toMap
    assert(got == Map(
      (("Exotic Liquids", "Beverages")) -> 1L,
      (("Exotic Liquids", "Condiments")) -> 1L,
      (("New Orleans Cajun Delights", "Beverages")) -> 1L))
  }

  test("customer to category through orders and products") {
    val got = rows("q_nw_customer_category").map(r => ((r(0), r(1)), r(2))).toMap
    assert(got(("Alfreds Futterkiste", "Beverages")) == 1L)
    assert(got(("Alfreds Futterkiste", "Condiments")) == 1L)
  }

  test("customer to supplier: Exotic Liquids tops with 2 orders") {
    val top = rows("q_nw_customer_supplier").head
    assert(top == Seq("Alfreds Futterkiste", "Exotic Liquids", 2L))
  }

  test("products per category: Beverages has 3") {
    assert(rows("q_nw_products_per_category").head == Seq("Beverages", 3L))
  }

  test("avg price per category: Beverages 14.0 over 3 products") {
    val top = rows("q_nw_avg_price").head
    assert(top(0) == "Beverages" && top(2) == 3L)
    assert(math.abs(top(1).asInstanceOf[Double] - 14.0) < 1e-4)
  }

  test("total quantity per product: Chai 5") {
    val top = rows("q_nw_qty_per_product").head
    assert(top(0) == "Chai" && top(1).toString.toDouble == 5.0)
  }

  test("orders per customer: ALFKI has 2") {
    assert(rows("q_nw_orders_per_customer").head == Seq("Alfreds Futterkiste", 2L))
  }

  test("products per supplier: Exotic Liquids supplies 2") {
    assert(rows("q_nw_products_per_supplier").head == Seq("Exotic Liquids", 2L))
  }

  test("top products by revenue: Chai at 90.0") {
    val top = rows("q_nw_top_revenue").head
    assert(top(0) == "Chai")
    assert(math.abs(top(1).asInstanceOf[Double] - 90.0) < 1e-4)
  }

  test("point lookup, no-orders anti-join, relationship count") {
    assert(rows("q_nw_point_lookup") == Seq(Seq("Alfreds Futterkiste")))
    assert(rows("q_nw_no_orders") == Seq(Seq("NoOrders")))
    assert(rows("q_nw_count_rels") == Seq(Seq(12L)))
  }
}
