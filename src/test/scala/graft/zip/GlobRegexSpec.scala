package graft.zip

import org.scalatest.funsuite.AnyFunSuite

/** Wax-glob semantics (reference filter: src/builder.rs:31,170,180-183). */
class GlobRegexSpec extends AnyFunSuite {

  private def matches(glob: String, s: String): Boolean =
    GlobRegex.compile(glob).matcher(s).matches()

  test("* stays within a path segment") {
    assert(matches("*.png", "a.png"))
    assert(!matches("*.png", "dir/a.png"))
    assert(matches("src/*.rs", "src/main.rs"))
    assert(!matches("src/*.rs", "src/sub/main.rs"))
  }

  test("** crosses path segments") {
    assert(matches("**/*.png", "a/b/c.png"))
    assert(matches("**/*.png", "c.png")) // zero segments
    assert(matches("a/**", "a/b/c"))
    assert(!matches("**/*.png", "a/b/c.txt"))
  }

  test("? matches exactly one non-slash char") {
    assert(matches("a?c", "abc"))
    assert(!matches("a?c", "ac"))
    assert(!matches("a?c", "a/c"))
  }

  test("character classes") {
    assert(matches("file[0-9].txt", "file7.txt"))
    assert(!matches("file[0-9].txt", "filex.txt"))
    assert(matches("file[!0-9].txt", "filex.txt"))
    assert(!matches("file[!0-9].txt", "file1.txt"))
  }

  test("brace alternation") {
    assert(matches("*.{png,jpg}", "a.png"))
    assert(matches("*.{png,jpg}", "b.jpg"))
    assert(!matches("*.{png,jpg}", "c.gif"))
  }

  test("regex metacharacters in literals are escaped") {
    assert(matches("a+b.txt", "a+b.txt"))
    assert(!matches("a+b.txt", "aab.txt"))
    assert(matches("a(1)$x", "a(1)$x"))
  }

  test("invalid globs raise InvalidGlobException (fixes reference B4 panic)") {
    intercept[GlobRegex.InvalidGlobException](GlobRegex.translate("a[bc"))
    intercept[GlobRegex.InvalidGlobException](GlobRegex.translate("a{b,c"))
    intercept[GlobRegex.InvalidGlobException](GlobRegex.translate("a}b"))
  }
}
