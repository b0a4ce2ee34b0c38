package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CryptoFunctions

/** App-layer relational surface (SURVEY.md §2.3 J1-J4, §2.5 W5-W6, §2.8
  * crypto): the FastAPI backend's lookups re-expressed as DataFrame programs
  * over `usercredentials` / `chathistory` / `vectordatabasestats`-shaped
  * tables (FIXTURES.md §5).
  */
object AppQueries {

  /** Registration duplicate check (J3, `main.py:36-38`): true iff the email
    * already exists. Semi-join so only a boolean leaves the scan.
    */
  def emailExists(users: DataFrame, email: String): Boolean =
    users.filter(col("user_email") === email).limit(1).count() > 0

  /** Register: salted PBKDF2 credential row (driver-side crypto — the salt
    * and hash are per-user scalars, not a data-plane op).
    */
  def newUserRow(spark: SparkSession, userId: Long, email: String, password: String): DataFrame = {
    import spark.implicits._
    val salt = CryptoFunctions.newSalt()
    val hash = CryptoFunctions.pbkdf2Hash(password, salt)
    Seq((userId, email, salt, hash, true)).toDF(
      "user_id", "user_email", "user_salt", "user_hashpassword", "active")
  }

  /** Login verify (P4 + pbkdf2, `crud.py:8-25`): point lookup then verify. */
  def verifyLogin(users: DataFrame, email: String, password: String): Boolean =
    users.filter(col("user_email") === email && col("active"))
      .select("user_salt", "user_hashpassword")
      .collect()
      .headOption
      .exists { r =>
        CryptoFunctions.pbkdf2Verify(password, r.getAs[Array[Byte]](0), r.getString(1))
      }

  /** Chat history newest-first with pagination (J1+W5+W6, `main.py:63-74`,
    * `crud.py:29-33`).
    */
  def chatHistory(chats: DataFrame, userId: Long, skip: Int = 0, limit: Int = 50): DataFrame =
    chats.filter(col("user_id") === userId)
      .orderBy(col("created_ts").desc, col("chat_id").desc)
      .offset(skip).limit(limit)

  /** User ⋈ chats over the FK (J1): broadcast the small user dim. */
  def chatsWithUsers(users: DataFrame, chats: DataFrame): DataFrame =
    chats.join(broadcast(users), Seq("user_id"))

  /** Form-catalog sync (J2 anti-join insert-if-absent,
    * `pipeline2.py:315-331`): returns the rows to append.
    */
  def newForms(existing: DataFrame, processed: DataFrame): DataFrame =
    processed.join(existing, Seq("form_name"), "left_anti")

  /** Forms catalog (A2 distinct, `pipeline2.py:60`). */
  def formCatalog(stats: DataFrame): DataFrame =
    stats.select("form_name").distinct()

  // -------------------------------------------------------------------
  // Stats-table mirror deletes (`pipeline2.py:333-367`): pipeline 2 keeps
  // `vectordatabasestats` in lock-step with the vector index. Each helper
  // returns the stats table's NEXT state as a lazy plan — at scale these
  // are distributed rewrites (filters / semi-joins), never id scans.
  // -------------------------------------------------------------------

  /** Mirror of delete-by-form-name (`pipeline2.py:333-345`). */
  def mirrorDeleteForms(stats: DataFrame, titles: Seq[String]): DataFrame =
    stats.filter(!col("form_name").isin(titles: _*))

  /** Mirror of delete-all (`pipeline2.py:347-352`). */
  def mirrorDeleteAll(stats: DataFrame): DataFrame = stats.limit(0)

  /** Mirror of delete-where-vectors-gone (`pipeline2.py:354-367`): keep only
    * stats rows whose form still has vectors in the index — a semi-join
    * against the index's surviving titles.
    */
  def pruneOrphans(stats: DataFrame, indexTitles: DataFrame): DataFrame =
    stats.join(
      indexTitles.select(col(indexTitles.columns.head).as("form_name")).distinct(),
      Seq("form_name"), "left_semi")
}
