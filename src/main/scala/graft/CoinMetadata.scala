package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** S5: the 5-row inline coin-metadata dimension
  * (`stg_deepbook_margin_pool_object.sql:22-33`). Part of query semantics,
  * not test data (FIXTURES.md §4) — reproduced verbatim as a case-class seed
  * and always broadcast-joined (SURVEY.md §4: tiny dim ⇒ broadcast hash join).
  */
object CoinMetadata {

  final case class Coin(coin_type: String, coin_symbol: String,
                        coin_decimals: Int, coin_name: String)

  val suiLongForm =
    "0x0000000000000000000000000000000000000000000000000000000000000002::sui::SUI"
  val suiShortForm = "0x2::sui::SUI"

  val coins: Seq[Coin] = Seq(
    Coin(suiLongForm, "SUI", 9, "Sui"),
    Coin(suiShortForm, "SUI", 9, "Sui"),
    Coin("0xdba34672e30cb065b1f93e3ab55318768fd6fef66c15942c9f7cb846e2f900e7::usdc::USDC",
         "USDC", 6, "USD Coin"),
    Coin("0x5d4b302506645c37ff133b98c4b50a5ae14841659738d6d733d59d0d217a93bf::coin::COIN",
         "wUSDC", 6, "Wormhole USDC"),
    Coin("0xdeeb7a4662eec9f2f3def03fb937a663dddaa2e215b8078a284d026b7946c270::deep::DEEP",
         "DEEP", 6, "DeepBook Token"))

  def seed(spark: SparkSession): DataFrame = {
    import spark.implicits._
    coins.toDF()
  }

  /** J1 join-key canonicalization: SUI short form → long form
    * (`stg_deepbook_margin_pool_object.sql:202-209`). */
  def canonicalCoinType(assetType: Column): Column =
    when(assetType === lit(suiShortForm), lit(suiLongForm)).otherwise(assetType)
}
