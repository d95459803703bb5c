package graft.functions

/** Shared text normalization for the kernels, replicating the SQL column
  * semantics EXACTLY (`lower(trim(text))` + `\s+`→' ' + split-keep-empty):
  * SQL `trim` strips SPACES ONLY — Java's `String.trim` strips every char
  * <= 0x20 (tab/newline/CR), which silently diverges from the
  * oracle-checked column path on text with leading/trailing whitespace
  * controls. Latent on the current fixtures (no \t/\n-framed docs); fatal
  * on a real corpus. */
object Norm {

  /** lower + SQL-trim(spaces) + collapse \s+ to single spaces. */
  def normalized(s0: String): String = {
    val lowered = s0.toLowerCase
    var b = 0
    var e = lowered.length
    while (b < e && lowered.charAt(b) == ' ') b += 1
    while (e > b && lowered.charAt(e - 1) == ' ') e -= 1
    lowered.substring(b, e).replaceAll("\\s+", " ")
  }

  /** Tokens of the normalized text; split keeps empty tokens (limit -1)
    * to match Spark `split` / DuckDB `string_split` semantics — empty
    * input yields one empty token. */
  def tokens(s0: String): Array[String] = normalized(s0).split(" ", -1)
}
