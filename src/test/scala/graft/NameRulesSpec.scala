package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.scrape.BBRefParse

/** SURVEY §2.2 #33: name stripping + collision keep
  * (reference _NameStripper, bbref_pages.py:169-185).
  */
class NameRulesSpec extends AnyFunSuite {

  test("middle initials strip") {
    assert(BBRefParse.stripName("Michael A. Taylor") == "Michael Taylor")
    // leading initial keeps (no preceding space), inner one strips
    assert(BBRefParse.stripName("A. J. Cole") == "A. Cole")
  }

  test("Jr./Sr. titles strip after middle initials") {
    assert(BBRefParse.stripName("Ken Griffey Jr.") == "Ken Griffey")
    assert(BBRefParse.stripName("Cal Ripken Sr.") == "Cal Ripken")
    assert(BBRefParse.stripName("Jackie Bradley Jr.") == "Jackie Bradley")
  }

  test("plain names unchanged") {
    assert(BBRefParse.stripName("Derek Jeter") == "Derek Jeter")
    assert(BBRefParse.stripName("Roberto Hernandez") == "Roberto Hernandez")
  }

  test("classify name ids") {
    assert(BBRefParse.classify("https://x/boxes/WAS/WAS201710120.shtml") == "GamePage")
    assert(BBRefParse.classify("https://x/players/v/vendipa01.shtml") == "PlayerPage")
    assert(BBRefParse.classify("https://x/players/s/sabatc.01.shtml") == "PlayerPage")
    assert(BBRefParse.classify("https://x/leagues/MLB/2016-schedule.shtml") == "SchedulePage")
    // game ids also match the player pattern — game must win
    assert(BBRefParse.classify("ATL200706260.shtml") == "GamePage")
  }

  test("on-base flags and inning half transforms") {
    assert(BBRefParse.onBaseFlags("---") == 0)
    assert(BBRefParse.onBaseFlags("1--") == 1)
    assert(BBRefParse.onBaseFlags("-2-") == 2)
    assert(BBRefParse.onBaseFlags("1-3") == 5)
    assert(BBRefParse.onBaseFlags("123") == 7)
    assert(BBRefParse.inningHalf("t1") == 0)
    assert(BBRefParse.inningHalf("b1") == 1)
    assert(BBRefParse.inningHalf("t11") == 20)
  }
}
