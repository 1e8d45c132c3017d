package graft.operators

/** Dev-only stage tracing for the fused lifecycle bodies: wraps a
  * named step and prints its wall time when `-Dgraft.trace=1` is set
  * (the BodyDrill workflow). A no-op — one boolean check — otherwise,
  * so production paths carry no cost and no output. */
private[graft] object Trace {
  val enabled: Boolean = sys.props.get("graft.trace").contains("1")
  def apply[A](name: String)(body: => A): A =
    if (!enabled) body
    else {
      val t0 = System.nanoTime()
      val r = body
      println(f"[trace] $name%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
}
