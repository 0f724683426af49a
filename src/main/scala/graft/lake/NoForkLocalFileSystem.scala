package graft.lake

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem whose chmod is pure-JVM (`Files.setPosixFilePermissions`)
  * instead of a forked `chmod` subprocess.
  *
  * Without the Hadoop native library, `RawLocalFileSystem.setPermission`
  * shells out — and EVERY local file create applies its permission that
  * way (`LocalFSFileOutputStream` applies the umasked mode on open), so a
  * busy local-mode engine forks a subprocess per written file: a
  * measurable per-file constant (~1–2 ms), tens of thousands of forks per
  * test/bench run, and a flake surface (a transiently SIGKILLed chmod
  * child fails the whole Spark task with ExitCodeException 137 —
  * observed twice in full-suite runs). The JDK can set POSIX permissions
  * natively; only the special bits (setuid/setgid/sticky), which NIO
  * cannot express, fall back to the shell path — they never occur on
  * engine-written data files.
  *
  * Install via `spark.hadoop.fs.file.impl = graft.lake.NoForkLocalFileSystem`
  * (the Verify/Bench/ScaleStress sessions and SparkTestBase do). Behavior
  * is identical to [[LocalFileSystem]] otherwise — same checksums, same
  * layout, same semantics.
  */
class NoForkLocalFileSystem
  extends LocalFileSystem(new NoForkRawLocalFileSystem)

/** The [[org.apache.hadoop.fs.AbstractFileSystem]] counterpart, for the
  * `FileContext` API: Structured Streaming's checkpoint/metadata managers
  * go through FileContext, which resolves `file://` via
  * `fs.AbstractFileSystem.file.impl` — NOT `fs.file.impl` — so without
  * this the streaming checkpoint writes still forked a chmod per
  * mkdir/create (the residual ExitCodeException flake in full-suite runs
  * after the FileSystem-side fix landed). Delegates straight to
  * [[NoForkRawLocalFileSystem]]; checkpoint managers don't rely on local
  * CRC sidecars.
  *
  * Install via `spark.hadoop.fs.AbstractFileSystem.file.impl =
  * graft.lake.NoForkLocalFs` (reflection requires the (URI, Configuration)
  * constructor).
  */
class NoForkLocalFs(uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new NoForkRawLocalFileSystem, conf, "file", false)

class NoForkRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    import java.nio.file.attribute.PosixFilePermission._
    val bits: Int = permission.toShort.toInt & 0xFFF
    if ((bits & 0xE00) != 0) { // setuid/setgid/sticky: NIO can't — shell
      super.setPermission(p, permission)
      return
    }
    val set = java.util.EnumSet
      .noneOf(classOf[java.nio.file.attribute.PosixFilePermission])
    def add(bit: Int, perm: java.nio.file.attribute.PosixFilePermission): Unit =
      if ((bits & bit) != 0) { set.add(perm); () }
    add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
    add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
    add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
    java.nio.file.Files.setPosixFilePermissions(
      java.nio.file.Paths.get(p.toUri.getPath), set)
    ()
  }
}
