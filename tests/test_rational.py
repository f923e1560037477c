from hacktv_tpu.rational import Rational, nearest, parse


def test_normalise():
    assert Rational(64000000, 17734475) == Rational(2560000, 709379)
    assert Rational(-4, 8) == Rational(-1, 2)
    assert Rational(4, -8) == Rational(-1, 2)


def test_arithmetic():
    a = Rational(16000000) / Rational(17734475, 4)
    assert (a.num, a.den) == (2560000, 709379)
    assert float(Rational(1, 4) + Rational(1, 2)) == 0.75
    assert Rational(3, 2) * 2 == Rational(3, 1)


def test_parse():
    assert parse("16:9") == Rational(16, 9)
    assert parse("13.5e6") == Rational(13500000)
    assert parse("4/3") == Rational(4, 3)
    assert parse("-0.5") == Rational(-1, 2)
    assert parse("2.5e-1") == Rational(1, 4)


def test_nearest():
    # 14/9 is exactly halfway; ties go to `a` (src/common.c:80-85)
    r = nearest(Rational(14, 9), Rational(4, 3), Rational(16, 9))
    assert r == Rational(4, 3)
    r = nearest(Rational(15, 9), Rational(4, 3), Rational(16, 9))
    assert r == Rational(16, 9)
    r = nearest(Rational(4, 3), Rational(4, 3), Rational(16, 9))
    assert r == Rational(4, 3)


def test_cmp():
    assert Rational(1, 3) < Rational(1, 2)
    assert Rational(30000, 1001) > Rational(25, 1)
