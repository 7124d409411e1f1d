"""Tokenizer golden tests, transcribed from the reference suite
(/root/reference/test/tok.jl:57-140). Spark-free."""

from textsearch_spark.config import IgnoreStopwords, Skipgram, TextConfig
from textsearch_spark.functions.tokenizer import tokenize

TEXT0 = "@user;) #jello.world"
TEXT1 = "hello world!! @user;) #jello.world :)"
TEXT2 = "a b c d e f g h i j k l m n o p q"


def test_unigrams_text0():
    # test/tok.jl:58-59
    assert tokenize(TextConfig(nlist=[1]), TEXT0) == ["@user", ";)", "#jello", ".", "world"]


def test_bigrams_text0():
    # test/tok.jl:61-62
    assert tokenize(TextConfig(nlist=[2]), TEXT0) == [
        "@user ;)\tn", ";) #jello\tn", "#jello .\tn", ". world\tn",
    ]


def test_trigrams_text0():
    # test/tok.jl:64-65
    assert tokenize(TextConfig(nlist=[3]), TEXT0) == [
        "@user ;) #jello\tn", ";) #jello .\tn", "#jello . world\tn",
    ]


def test_qgrams3_text0():
    # test/tok.jl:67-68
    expected = [p + "\tq" for p in [
        " @u", "@us", "use", "ser", "er;", "r;)", ";) ", ") #", " #j",
        "#je", "jel", "ell", "llo", "lo.", "o.w", ".wo", "wor", "orl",
        "rld", "ld ",
    ]]
    assert tokenize(TextConfig(qlist=[3]), TEXT0) == expected


def test_unigrams_text1():
    # test/tok.jl:70-71
    assert tokenize(TextConfig(nlist=[1]), TEXT1) == [
        "hello", "world", "!!", "@user", ";)", "#jello", ".", "world", ":)",
    ]


def test_skipgrams_21_text1():
    # test/tok.jl:73-74
    expected = [p + "\ts" for p in [
        "hello !!", "world @user", "!! ;)", "@user #jello", ";) .",
        "#jello world", ". :)",
    ]]
    assert tokenize(TextConfig(slist=[Skipgram(2, 1)]), TEXT1) == expected


def test_message_vectors():
    # test/tok.jl:78-85: a multi-message doc tokenizes like the joined
    # text except for the n-grams that straddle the message boundary
    m = TextConfig(nlist=[1, 2])
    a = tokenize(m, "hello ;) #jello world.")
    b = tokenize(m, ["hello ;)", "#jello world."])
    b = b + [";) #jello\tn"]
    assert sorted(a) == sorted(b)


def test_normalize_and_tokenize_123():
    # test/tok.jl:103-108
    cfg = TextConfig(del_punc=True, group_usr=True, nlist=[1, 2, 3], mark_token_type=False)
    assert tokenize(cfg, TEXT1) == [
        "hello", "world", "_usr", "#jello", "world",
        "hello world", "world _usr", "_usr #jello", "#jello world",
        "hello world _usr", "world _usr #jello", "_usr #jello world",
    ]


def test_normalize_and_tokenize_23():
    # test/tok.jl:110-116
    cfg = TextConfig(del_punc=True, group_usr=True, nlist=[2, 3], mark_token_type=False)
    assert tokenize(cfg, TEXT1) == [
        "hello world", "world _usr", "_usr #jello", "#jello world",
        "hello world _usr", "world _usr #jello", "_usr #jello world",
    ]


def test_numbers_punct_edge_cases():
    # test/tok.jl:118-124
    cfg = TextConfig(del_punc=False, group_usr=True, nlist=[1], mark_token_type=False)
    text3 = "a ab __b @@c ..!d ''e \"!\"f +10 -20 30 40.00 .50 6.0 7.. ======= !()[]{}"
    assert tokenize(cfg, text3) == [
        "a", "ab", "__b", "@_usr", "..!", "d", "''", "e", "\"!\"", "f",
        "0", "0", "0", "0", "0", "0", "0", ".", "=======", "!()", "[]{", "}",
    ]


def test_skipgrams_31():
    # test/tok.jl:126-132
    cfg = TextConfig(del_punc=False, group_usr=False, slist=[Skipgram(3, 1)])
    assert tokenize(cfg, TEXT1) == [p + "\ts" for p in [
        "hello !! ;)", "world @user #jello", "!! ;) .",
        "@user #jello world", ";) . :)",
    ]]


def test_skipgrams_31_21_unmarked():
    # test/tok.jl:134-139
    cfg = TextConfig(del_punc=False, group_usr=False, nlist=[],
                     slist=[Skipgram(3, 1), Skipgram(2, 1)], mark_token_type=False)
    assert tokenize(cfg, TEXT1) == [
        "hello !!", "world @user", "!! ;)", "@user #jello", ";) .",
        "#jello world", ". :)",
        "hello !! ;)", "world @user #jello", "!! ;) .",
        "@user #jello world", ";) . :)",
    ]


def test_empty_and_default_config():
    assert tokenize(TextConfig(), "") == []
    # empty q/n/s lists default to nlist=[1] (src/textconfig.jl:77-79)
    assert TextConfig().nlist == (1,)
    assert tokenize(TextConfig(), "hola mundo") == ["hola", "mundo"]


def test_stopwords_transformation():
    cfg = TextConfig(nlist=[1], tt=IgnoreStopwords({"la", "de"}))
    assert tokenize(cfg, "la casa de la manzana") == ["casa", "manzana"]


def test_collocations():
    # pairs (w_i, w_j), j in i+1..min(i+1+q, n) per src/tokenize.jl:304-318
    cfg = TextConfig(nlist=[1], collocations=2)
    toks = tokenize(cfg, "a b c d")
    assert toks[:4] == ["a", "b", "c", "d"]
    assert toks[4:] == ["a b\tc", "a c\tc", "a d\tc", "b c\tc", "b d\tc", "c d\tc"]


def test_group_num_trailing_space_quirk():
    # RE_NUM replacement is "0 " with a trailing blank (src/normalize.jl:19,38-40)
    assert tokenize(TextConfig(nlist=[1]), "v1.2 beats v1") == ["v0", "beats", "v0"]


def test_url_grouping():
    assert tokenize(TextConfig(nlist=[1]), "see https://x.io/a?b=1 now") == [
        "see", "_url", "now",
    ]


def test_diacritics_and_case():
    assert tokenize(TextConfig(nlist=[1]), "Canción ÁRBOL") == ["cancion", "arbol"]


def test_del_dup():
    cfg = TextConfig(nlist=[1], del_dup=True, group_num=False)
    assert tokenize(cfg, "aaaa bb cccc") == ["aa", "bb", "cc"]
