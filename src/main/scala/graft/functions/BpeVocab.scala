package graft.functions

/** The engine's frozen default BPE merge table: the verbatim output of
  * `BpeTokenizer.trainMerges(documents @ sf0.01, "text", 48)` — 48
  * merges trained on the synthetic document fixture and frozen here as
  * the vocab artifact (the same freeze-an-artifact discipline as the
  * IVF quantizer: budgets, packing, and dataset cards tokenize under a
  * FIXED table; retrain-and-swap is a deliberate maintenance act, never
  * an implicit side effect). `BpeSpec` ("Default is trainMerges'
  * verbatim output") pins this list against a fresh training run, so
  * the lineage is checked, not asserted.
  *
  * The table satisfies the replayability invariant (BpeEncode) by
  * construction, which is what lets every gate oracle replay the
  * encode in plain SQL.
  */
object BpeVocab {

  val Default: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
    ("at", "c"),
    ("atc", "h"),
    ("b", "atch"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("c", "u"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("cu", "st"),
    ("cust", "o"),
    ("custo", "mer"),
    ("f", "i"),
    ("fi", "l"),
    ("fil", "t"),
    ("filt", "er"),
    ("a", "l"),
    ("al", "l"),
    ("m", "all"),
    ("s", "mall"),
    ("g", "e"),
    ("l", "ow"),
    ("mer", "ge"),
    ("s", "low"),
    ("c", "t"),
    ("ct", "or"),
    ("d", "er"),
    ("e", "ctor"),
    ("or", "der"),
    ("v", "ector"),
  )
}
