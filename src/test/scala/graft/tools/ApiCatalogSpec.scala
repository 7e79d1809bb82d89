package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** API-surface freshness law (the §2.9 pattern applied to the library
  * catalog): the checked-in `API.md` must equal a fresh render — a new
  * or re-signed public operator, or one missing its Scaladoc contract,
  * fails the suite until the catalog is regenerated
  * (`runMain graft.tools.ApiCatalog`). render() itself throws on any
  * undocumented public operator, so the catalog cannot go silently
  * incomplete either. */
class ApiCatalogSpec extends AnyFunSuite {
  test("API.md is fresh and every public operator carries a contract") {
    val want = ApiCatalog.render()
    val got = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("API.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(got == want,
      "API.md is stale — regenerate with: runMain graft.tools.ApiCatalog")
  }
}
