package graft.spec

/**
 * Compile-time unrolling of recursive schemas — the columnar analog of
 * reference `validators/definitions.rs` (definitions + definition-ref,
 * registry `mod.rs`). The reference resolves refs lazily per input object;
 * here input columns have finite static depth, so [[DefinitionsSpec]]
 * substitutes every [[RefSpec]] with its definition up front, spending one
 * unit of budget per expansion (cycles therefore terminate). A ref past
 * the budget becomes [[AnySpec]].
 */
object Definitions {

  /** Substitute refs in `spec` from `defs`, spending budget per expansion. */
  def unroll(spec: Spec, defs: Map[String, Spec], budget: Int): Spec = {
    def go(s: Spec, b: Int): Spec = s match {
      case RefSpec(name) =>
        if (b <= 0) AnySpec
        else go(defs.getOrElse(name, throw new IllegalArgumentException(
          s"unknown definition ref '$name' (have: ${defs.keys.mkString(", ")})")),
          b - 1)
      case DefinitionsSpec(innerDefs, root, innerBudget) =>
        // nested containers resolve against their own (merged) scope
        unroll(root, defs ++ innerDefs, math.min(b, innerBudget))
      case NullableSpec(i) => NullableSpec(go(i, b))
      case w: WithDefaultSpec => w.copy(inner = go(w.inner, b))
      case ChainSpec(steps) => ChainSpec(steps.map(go(_, b)))
      case u: UnionSpec => u.copy(choices = u.choices.map(go(_, b)))
      case t: TaggedUnionSpec =>
        t.copy(choices = t.choices.map { case (k, v) => k -> go(v, b) })
      case c: CustomErrorSpec => c.copy(inner = go(c.inner, b))
      case j: JsonSpec => j.copy(inner = j.inner.map(m =>
        go(m, b).asInstanceOf[ModelSpec]))
      case l: ListSpec => l.copy(item = go(l.item, b))
      case t: TupleSpec => t.copy(items = t.items.map(go(_, b)),
        variadic = t.variadic.map(go(_, b)),
        suffix = t.suffix.map(go(_, b)))
      case nt: NamedTupleSpec =>
        nt.copy(fields = nt.fields.map(f => f.copy(spec = go(f.spec, b))))
      case dc: DataclassSpec =>
        dc.copy(fields = dc.fields.map(f => f.copy(spec = go(f.spec, b))))
      case st: SetSpec => st.copy(item = go(st.item, b))
      case d: DictSpec => d.copy(key = go(d.key, b), value = go(d.value, b))
      case m: ModelSpec =>
        m.copy(fields = m.fields.map(f => f.copy(spec = go(f.spec, b))))
      case fb: FunctionBeforeSpec => fb.copy(inner = go(fb.inner, b))
      case fa: FunctionAfterSpec => fa.copy(inner = go(fa.inner, b))
      case fw: FunctionWrapSpec => fw.copy(inner = go(fw.inner, b))
      case leaf => leaf
    }
    go(spec, budget)
  }
}
