package graft.extract

/** Per-provider model catalogs — the control-plane analog of the
  * reference's `list_models` family (SURVEY.md §2.5 A1).
  *
  * Reference behaviors reproduced:
  *  - per-host dispatch on the provider name with every failure routed
  *    to a FALLBACK catalog (/root/reference/python.py:175-200 — where
  *    four `_list_*_models` dispatch targets are not even defined and
  *    the AttributeError is swallowed into the fallback at :198-200;
  *    here the dispatch table is total by construction, and fetch
  *    errors still fall back);
  *  - OpenRouter's hardcoded fallback list when the REST fetch fails
  *    (/root/reference/python.py:142-173);
  *  - the OpenAI prefix whitelist + sort (/root/reference/python.py:74-86);
  *  - case-insensitive substring model search
  *    (/root/reference/app.py:378-391).
  *
  * The catalog is driver-side metadata (a few dozen strings per
  * provider) — deliberately NOT a Dataset; shipping it through Spark
  * would be orchestrating a lookup table.
  */
object ProviderCatalogs {

  /** One backend: how to fetch its live catalog, what to answer when
    * the fetch fails, and an optional name-prefix whitelist applied
    * before sorting (the reference's gpt-4/gpt-3.5 filter).
    */
  final case class Provider(
      name: String,
      fetch: () => Seq[String],
      fallback: Seq[String],
      prefixWhitelist: Seq[String] = Nil)

  /** Deterministic built-in registry (names generalize the
    * reference's provider set; the catalogs are placeholders — a real
    * deployment swaps `fetch` for its endpoint call).
    */
  val builtin: Map[String, Provider] = Seq(
    Provider("alpha", () => Seq("alpha-large", "alpha-small", "beta-x"),
      Seq("alpha-small"), prefixWhitelist = Seq("alpha-")),
    Provider("beta", () => sys.error("beta endpoint unreachable"),
      Seq("beta-base", "beta-pro")),
    Provider("local", () => Seq("scanner-v2", "scanner-v1"), Nil)
  ).map(p => p.name -> p).toMap

  /** Catalog for one provider: dispatch by name, fetch with fallback
    * on ANY failure, prefix-filter, sort. Unknown providers answer the
    * empty catalog (the reference's except-arm, not an exception).
    */
  def listModels(provider: String,
                 registry: Map[String, Provider] = builtin): Seq[String] =
    registry.get(provider) match {
      case None => Nil
      case Some(p) =>
        val raw = try p.fetch()
          catch { case scala.util.control.NonFatal(_) => p.fallback }
        val filtered =
          if (p.prefixWhitelist.isEmpty) raw
          else raw.filter(m => p.prefixWhitelist.exists(m.startsWith))
        filtered.sorted
    }

  /** Case-insensitive substring search across every provider's
    * catalog: (provider, model) pairs, deterministically ordered.
    */
  def searchModels(q: String,
                   registry: Map[String, Provider] = builtin): Seq[(String, String)] =
    registry.keys.toSeq.sorted.flatMap(p =>
      listModels(p, registry).filter(_.toLowerCase.contains(q.toLowerCase))
        .map(p -> _))
}
