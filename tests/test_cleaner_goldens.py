"""Document-level goldens lifted from the reference's
PrepareDocumentSpec.scala (line numbers cited per case) — the full
prepare() state machine must reproduce these exactly: line structure and
trailing whitespace preserved, blocks sliced to [sentence start, sentence
end], junk fronts/backs removed, abbreviation/URL/'..' endings rejected."""

import pytest

from commoncrawlscalatools_spark.functions.cleaner import (
    find_sentence_end_index,
    get_start_index_with_additional_chars,
    prepare_document_py,
    tokenize_line,
)

FULLQUOTE_BLOCK = (
    '"On the eve of the election last month my wife Judith and I were driving '
    "home late in the afternoon and turned on the radio for the traffic and "
    "weather. What we instantly got was a freak show of political pornography: "
    "lies, distortions, and half-truths -- half-truths being perhaps the "
    'blackest of all lies. "'
)

GOLDENS = [
    # (spec line, document, expected)
    (
        "Spec:17 remove non sentence material from the start",
        " for the traffic and weather. What we instantly got was a freak show "
        "of political pornography: lies, distortions, and half-truths -- "
        "half-truths being perhaps the blackest of all lies.",
        "What we instantly got was a freak show of political pornography: "
        "lies, distortions, and half-truths -- half-truths being perhaps the "
        "blackest of all lies.",
    ),
    (
        "Spec:26 no NoSuchElementException, empty result",
        "Leftists\nSHARE: Email ThisBlogThis!Share to TwitterShare to "
        "FacebookShare to Pinterest\nNo comments:\n",
        "",
    ),
    (
        "Spec:41 include short lines at the end of a text block",
        "Charles Barron didn't lose the race. PUBLIC Education lost today. "
        "Remember to say a BIG THANK YOU to the Working Families Party,\n"
        "  community based organizations, education advocacy groups and all the\n"
        "  unions that endorsed Jeffries for their great assistance in bringing\n"
        "  vouchers to NYS!",
        "Charles Barron didn't lose the race. PUBLIC Education lost today. "
        "Remember to say a BIG THANK YOU to the Working Families Party,\n"
        "  community based organizations, education advocacy groups and all the\n"
        "  unions that endorsed Jeffries for their great assistance in bringing\n"
        "  vouchers to NYS!",
    ),
    (
        "Spec:59 include only one short line at the end",
        "Charles Barron didn't lose the race. PUBLIC Education lost today. "
        "Remember to say a BIG THANK YOU to the Working Families Party,\n"
        "community based organizations, education advocacy groups and all the\n"
        "unions that endorsed Jeffries for their great assistance in bringing\n"
        "vouchers to NYS!\nYes, I'm disgusted.",
        "Charles Barron didn't lose the race. PUBLIC Education lost today. "
        "Remember to say a BIG THANK YOU to the Working Families Party,\n"
        "community based organizations, education advocacy groups and all the\n"
        "unions that endorsed Jeffries for their great assistance in bringing\n"
        "vouchers to NYS!",
    ),
    (
        "Spec:78 not delete this text block (curly quotes)",
        "“Hakeem Jeffries just seems to be the best prepared,” said voter\n"
        "  Carla Denalli, 46, of Fort Greene. “He would work much better with"
        "                                                   \n"
        "  the other members of Congress than Charles Barron, who is always\n"
        "  combative [and] very reminiscent of the boy who cried wolf.”",
        "“Hakeem Jeffries just seems to be the best prepared,” said voter\n"
        "  Carla Denalli, 46, of Fort Greene. “He would work much better with"
        "                                                   \n"
        "  the other members of Congress than Charles Barron, who is always\n"
        "  combative [and] very reminiscent of the boy who cried wolf.”",
    ),
    (
        "Spec:96 evaluate the last dropped line - test 1",
        "In case the point was lost in the moment of triumph, Mr. Jeffries\n"
        "later told reporters that “the contrast in the race was clear. I\n"
        "have a record of success and forming coalitions. These are serious\n"
        "times and Congress is a serious job.”\n"
        "Mr. Jeffries’s supporters echoed\n"
        "that sense throughout the day, amid light turnout in the odd June\n"
        "primary to anoint a Democrat to succeed Rep. Ed Towns, who is\n"
        "retiring after 30 years in Congress.",
        "In case the point was lost in the moment of triumph, Mr. Jeffries\n"
        "later told reporters that “the contrast in the race was clear. I\n"
        "have a record of success and forming coalitions. These are serious\n"
        "times and Congress is a serious job.”\n"
        "Mr. Jeffries’s supporters echoed\n"
        "that sense throughout the day, amid light turnout in the odd June\n"
        "primary to anoint a Democrat to succeed Rep. Ed Towns, who is\n"
        "retiring after 30 years in Congress.",
    ),
    (
        "Spec:120 evaluate the last dropped line - test 2",
        "Mr. Barron pronounced himself “the best candidate,” adding, “At\n"
        "  the risk of sounding like a sore loser, there will be no\n"
        "  congratulatory statement made because the other candidate ran a"
        "                                                      \n"
        "  smear campaign [and] showed a lack of character.”",
        "Mr. Barron pronounced himself “the best candidate,” adding, “At\n"
        "  the risk of sounding like a sore loser, there will be no\n"
        "  congratulatory statement made because the other candidate ran a"
        "                                                      \n"
        "  smear campaign [and] showed a lack of character.”",
    ),
    (
        "Spec:139 no dropped starting line when block starts capitalized",
        "EDUCATE! ORGANIZE!! MOBILIZE!!!\n"
        "These are the three pillars on which Ed Notes is founded – providing "
        "information on current ed issues, organizing activities around fighting "
        "for public education in NYC and beyond and exposing the motives behind "
        "the education deformers. We are part of a tiny band of resisters. "
        "Nothing will change unless YOU GET INVOLVED IN THE STRUGGLE!",
        "These are the three pillars on which Ed Notes is founded – providing "
        "information on current ed issues, organizing activities around fighting "
        "for public education in NYC and beyond and exposing the motives behind "
        "the education deformers. We are part of a tiny band of resisters. "
        "Nothing will change unless YOU GET INVOLVED IN THE STRUGGLE!",
    ),
    (
        "Spec:153 two+ periods is not a complete sentence",
        "MORE Endorses National Resolution on Super High Stakes Issue T..",
        "",
    ),
    (
        "Spec:161 drop '..'-ending fragment from block end",
        "Be Warned, Avoid This School At All Costs.\n"
        "One of the worst schools for teachers to find themselves in is William "
        "Cullen Bryant High School in Queens. This school has one of the l...",
        "Be Warned, Avoid This School At All Costs.\n"
        "One of the worst schools for teachers to find themselves in is William "
        "Cullen Bryant High School in Queens.",
    ),
    (
        "Spec:177 keep block despite non-qualifying middle line",
        "“I am committed to the public school system, and we will support"
        "                                                     \n"
        "public schools and parochials schools,” he said. He also said he "
        "would work to help homeowners who are at risk of    \n"
        "foreclosure. East New York, Canarsie and Bedford-Stuyvesant — all\n"
        "within the Eighth Congressional District — are particularly hard\n"
        "hit, he said.",
        "“I am committed to the public school system, and we will support"
        "                                                     \n"
        "public schools and parochials schools,” he said. He also said he "
        "would work to help homeowners who are at risk of    \n"
        "foreclosure. East New York, Canarsie and Bedford-Stuyvesant — all\n"
        "within the Eighth Congressional District — are particularly hard\n"
        "hit, he said.",
    ),
    (
        "Spec:196 keep block despite middle line - test 2",
        "Assemblyman Alec Brook-Krasny, who represents Brighton Beach and\n"
        "its large Russian population, said Mr. Barron’s rhetoric on Israel\n"
        "helped earn Mr. Jeffries strong support among Russian Jews.\n"
        "“I’ve never seen such strong numbers,” said Mr. Brook-Krasny. “We\n"
        "have some election districts with votes of 44–0, 115–2, 32–2. It’s\n"
        "because, one, we had a great candidate, but also, two, that\n"
        "Charles Barron has opinions about Israel that the Russian Jews do\n"
        "not find suitable for Israel. It’s like he’s a foreign enemy.”",
        "Assemblyman Alec Brook-Krasny, who represents Brighton Beach and\n"
        "its large Russian population, said Mr. Barron’s rhetoric on Israel\n"
        "helped earn Mr. Jeffries strong support among Russian Jews.\n"
        "“I’ve never seen such strong numbers,” said Mr. Brook-Krasny. “We\n"
        "have some election districts with votes of 44–0, 115–2, 32–2. It’s\n"
        "because, one, we had a great candidate, but also, two, that\n"
        "Charles Barron has opinions about Israel that the Russian Jews do\n"
        "not find suitable for Israel. It’s like he’s a foreign enemy.”",
    ),
    (
        "Spec:219 rejected interstitial not prepended to capitalized block",
        "Yes, I'm disgusted.\n"
        "Read the article below:\n"
        "June 27, 2012, 1:03 am Comment\n"
        "Hakeem Jeffries Defeats Charles Barron in\n"
        "Bitter Democratic Primary\n"
        "By GERSH\n"
        "KUNTZMAN\n"
        "Gersh Kuntzman (left) and\n"
        "Matthew J. Perlman Assemblyman\n"
        "Hakeem Jeffries beat Councilman Charles Barron for the\n"
        "Democratic nomination for Congress yesterday, tantamount to\n"
        "election in deeply Democratic Brooklyn.",
        "Gersh Kuntzman (left) and\n"
        "Matthew J. Perlman Assemblyman\n"
        "Hakeem Jeffries beat Councilman Charles Barron for the\n"
        "Democratic nomination for Congress yesterday, tantamount to\n"
        "election in deeply Democratic Brooklyn.",
    ),
    (
        "Spec:246 no dropped initial line when block already starts sentence",
        "KUNTZMAN\n"
        "Gersh Kuntzman (left) and\n"
        "Matthew J. Perlman Assemblyman\n"
        "Hakeem Jeffries beat Councilman Charles Barron for the\n"
        "Democratic nomination for Congress yesterday, tantamount to\n"
        "election in deeply Democratic Brooklyn.",
        "Gersh Kuntzman (left) and\n"
        "Matthew J. Perlman Assemblyman\n"
        "Hakeem Jeffries beat Councilman Charles Barron for the\n"
        "Democratic nomination for Congress yesterday, tantamount to\n"
        "election in deeply Democratic Brooklyn.",
    ),
    (
        "Spec:266 single letter + period is not a sentence ending",
        "Harry Reid: James Comey is the New J. Edgar Hoover",
        "",
    ),
    (
        "Spec:271 drop beginning and ending junk lines",
        " more...\n"
        "Comments are welcome. Irrelevant and abusive comments will be deleted, "
        "as will all commercial links. Comment moderation is on, so if your "
        "comment does not appear it is because I have not been at my computer "
        "(I do not do cell phone moderating).\n"
        "Newer Post",
        "Comments are welcome. Irrelevant and abusive comments will be deleted, "
        "as will all commercial links. Comment moderation is on, so if your "
        "comment does not appear it is because I have not been at my computer "
        "(I do not do cell phone moderating).",
    ),
    (
        "Spec:281 a period inside a URL is not a sentence ending",
        "Great Post on Teacher Quality at the Morton School"
        "                                                                   \n"
        "I'm very tired of the myth that schools are bursting at the seams with "
        "apathetic, unskilled, surly, child-hating losers who can't get jobs "
        "doing anything else. I recently figured that, counting high school and "
        "college where one encounters many teachers in the course of a year, I "
        "had well over 100 teachers in my lifetime, and I can only say that one "
        "or two truly had no place being in a classroom.More at: "
        "http://themortonschool.blogspot.com/2009/07/its-teachers-stupidright.html\n"
        "The Randi Sellout Tour\n",
        "Great Post on Teacher Quality at the Morton School"
        "                                                                   \n"
        "I'm very tired of the myth that schools are bursting at the seams with "
        "apathetic, unskilled, surly, child-hating losers who can't get jobs "
        "doing anything else.",
    ),
    (
        "Spec:299 reject 100% non-alphanumeric middle lines",
        "Outrage on the Page | notes from a teacher educator"
        "                                                                  \n"
        "The PARCC Test: Exposed [excerpts deleted under legal threat from Parcc]"
        "                                             \n"
        "-                                                                "
        "                                                    \n"
        "The author of this blog posting is a public school teacher who will "
        "remain anonymous. I will not reveal my …\n",
        "The author of this blog posting is a public school teacher who will "
        "remain anonymous.",
    ),
    (
        "Spec:315 reject block too long before first sentence ending",
        "January 10th, 2014 | Tags: Boehner, death penalty, filibuster, "
        "ObamaCare, property rights, quotas, RINOs, Supreme Court | Category: "
        "Constitution, Courts, Legal, Crime, Criminal Justice, Elections, "
        "Campaigns, Healthcare, public health, Politics, Race, Ethnicity, The "
        "Left, The Right | Leave a comment widget @ surfing-waves.com The "
        "politically motivated, wrongful prosecution of Rick Renzi\n"
        "New AG Sessions and Congress Must Investigate DOJ Corruption in the "
        "Case of Rep. Rick Renzi\n"
        "Rick Renzi Puts Together Top Legal Team to Appeal Hidden Evidence of "
        "FBI Agent's Corruption\n"
        "Judge Unbelievably Refuses to Grant a Retrial for Former Rep. Renzi "
        "Despite Finding Rampant Prosecutorial Wrongdoing\n"
        "Bombshell: New Evidence Reveals Prosecutor Corruption in Trial Against "
        "Former Congressman Rick Renzi\n"
        "Time For a Congressional Investigation: Shattering New Developments of "
        "Corruption in Rep. Renzi Trial\n"
        "Judge Unravels Illegal Activity by Prosecution That Ensured a "
        "Conviction of Renzi — But Will he do Anything About it?",
        "",
    ),
    (
        "Spec:346 remove non sentence material from the end",
        "On the eve of the election last month my wife Judith and I were "
        "driving home late in the afternoon and turned on the radio for the "
        "traffic and weather. What we instantly got was a freak sh",
        "On the eve of the election last month my wife Judith and I were "
        "driving home late in the afternoon and turned on the radio for the "
        "traffic and weather.",
    ),
    (
        "Spec:363 space between quote and sentence terminator",
        'nutrition and hydration will be taken away."\n'
        "--MICHAEL SCHIAVO\n" + FULLQUOTE_BLOCK + "\n"
        "--BILL MOYERS\n"
        '"I hate the Republicans an',
        FULLQUOTE_BLOCK,
    ),
    (
        "Spec:392 erase uncapitalized non-sentence",
        'nutrition and hydration will be taken away."\n--MICHAEL SCHIAVO',
        "",
    ),
    (
        "Spec:399 straight double quotes",
        'start blah blah "Nutrition and hydration will be taken away." blah blah',
        '"Nutrition and hydration will be taken away."',
    ),
    (
        "Spec:406 unicode curled double quotes",
        "start blah blah “Nutrition and hydration will be taken away.” blah blah",
        "“Nutrition and hydration will be taken away.”",
    ),
    (
        "Spec:413 unicode single quotes",
        "start blah blah ‘Nutrition and hydration will be taken away.’ blah blah",
        "‘Nutrition and hydration will be taken away.’",
    ),
    (
        "Spec:424 tag-cloud snippet returns empty string",
        "Ted Cruz\n(54)\nTed Cruz. Ted Cruz Rally North Idaho\n(1)\nTed Nugent\n(1)",
        "",
    ),
    (
        "Spec:443 brackets between sentence start and quotation",
        '"[Tea Party Republicans] have acted like terrorists." --JOE BIDEN',
        '"[Tea Party Republicans] have acted like terrorists."',
    ),
]


@pytest.mark.parametrize("name,document,expected", GOLDENS, ids=[g[0] for g in GOLDENS])
def test_prepare_document_goldens(name, document, expected):
    assert prepare_document_py(document) == expected


def test_get_start_index_with_additional_chars_spec_377():
    # PrepareDocumentSpec:377 — Some(63) for the complex MOYERS block
    document = (
        'nutrition and hydration will be taken away."\n'
        "--MICHAEL SCHIAVO\n" + FULLQUOTE_BLOCK + "\n"
        "--BILL MOYERS\n"
        '"I hate the Republicans an'
    )
    assert get_start_index_with_additional_chars(document, '"', "On") == 63


def test_find_sentence_end_index_spec_529():
    # PrepareDocumentSpec:529 — Some(103) with a unicode closing quote
    sentence = (
        "have a record of success and forming coalitions. These are serious\n"
        "times and Congress is a serious job.”\n"
        "Mr Jeffries’s supporters echoed\n"
    )
    tokens = tokenize_line(sentence)
    assert find_sentence_end_index(sentence, tokens) == 103


def test_find_sentence_end_index_spec_521():
    # PrepareDocumentSpec:521 — period + double quote ends at len-1
    sentence = '"This is my test quote."'
    tokens = tokenize_line(sentence)
    assert find_sentence_end_index(sentence, tokens) == len(sentence) - 1


# ---------------------------------------------------------------------------
# Helper-level spec cases — the rest of PrepareDocumentSpec.scala (:467-916).
# With these, every case in the 916-line spec is ported (VERDICT r2 #7).
# ---------------------------------------------------------------------------

from commoncrawlscalatools_spark.functions.cleaner import (  # noqa: E402
    _TREEBANK_TO_CHAR,
    _has_period_next,
    _has_period_previous,
    _has_space_or_ending_next,
    _match_two_characters,
    _sentence_additional_start_chars,
    adjust_index_for_additional_characters,
    is_valid_sentence_ending,
)


@pytest.mark.parametrize(
    "token,expected",
    [("''", '"'), ("'", "'"), ("-LRB-", "("), ("-LSB-", "["), ("-LCB-", "{")],
)
def test_translate_treebank_token_spec_467(token, expected):
    # PrepareDocumentSpec:467-489
    assert _TREEBANK_TO_CHAR[token] == expected


@pytest.mark.parametrize(
    "previous,expected",
    [
        (["''", "-LRB-"], '"'),
        (["-LRB-", "''"], '"('),
        (["-LRB-", "-LCB-", "''"], "("),
        (["`", "blah", "blah", "start"], "‘"),
    ],
)
def test_get_sentence_additional_start_characters_spec_517(previous, expected):
    # PrepareDocumentSpec:517-539 (previous_tokens nearest-first)
    assert _sentence_additional_start_chars(previous) == expected


@pytest.mark.parametrize(
    "textblock,previous_chars,start_token,expected",
    [
        # PrepareDocumentSpec:541-689
        ("start blah blah ‘Nutrition and hydration will be taken away.’ blah blah",
         "‘", "Nutrition", 16),
        ("short", "", "Somethinglong", None),
        ("Hello World", "", "Hello", 0),
        ('"Hello World', '"', "Hello", 0),
        ("“Hello World", "“", "Hello", 0),
        ("‘Hello World", "‘", "Hello", 0),
        ("[Hello] World", "[", "Hello", 0),
        ("[ Hello] World", "[", "Hello", 0),
        ('"[Hello] World', '"[', "Hello", 0),
        ('" [ Hello] World', '"[', "Hello", 0),
        ("junk Hello World", "", "Hello", 5),
        ("junk [Hello World", "[", "Hello", 5),
        ("junk {{Hello World", "{{", "Hello", 5),
        ("junk { { Hello World", "{{", "Hello", 5),
        ("junk { {   Hello} World}", "{{", "Hello", 5),
        ('junk "Hello World}', '"', "Hello", 5),
        ('junk " Hello World}', '"', "Hello", 5),
    ],
)
def test_get_start_index_with_additional_chars_spec_541(
    textblock, previous_chars, start_token, expected
):
    assert (
        get_start_index_with_additional_chars(textblock, previous_chars, start_token)
        == expected
    )


@pytest.mark.parametrize(
    "a,b,expected",
    [
        # PrepareDocumentSpec:694-744 (matchTwoCharacters)
        ("a", "a", True),
        ("a", "b", False),
        ('"', '"', True),
        ('"', "“", True),
        ("“", '"', True),
        ('"', "”", True),
        ("”", '"', True),
        ("”", "“", True),
        ("“", "”", True),
        ("`", "‘", True),
        ("‘", "`", True),
        ("'", "’", True),
        ("’", "'", True),
    ],
)
def test_match_two_characters_spec_694(a, b, expected):
    assert _match_two_characters(a, b) is expected


def test_adjacent_period_and_space_helpers_spec_748():
    # PrepareDocumentSpec:748-795
    assert _has_period_previous("hello..", 6)
    assert not _has_period_previous("hello-.", 6)
    assert not _has_period_previous("hello-.", 0)
    assert _has_period_next("hello..", 5)
    assert not _has_period_next("hello.-", 5)
    assert not _has_period_next("hello-.", 6)
    assert _has_space_or_ending_next("hello-.", 6)
    assert _has_space_or_ending_next("hello-. World", 6)
    assert not _has_space_or_ending_next("hello-.-World", 6)


def test_adjust_index_for_additional_characters_spec_798():
    # PrepareDocumentSpec:798-822
    assert adjust_index_for_additional_characters("“This is my sentence.”", 20) == 21
    assert adjust_index_for_additional_characters("“This is my (sentence.)”", 21) == 23
    assert adjust_index_for_additional_characters("“This is my (sentence. ", 21) == 21
    assert adjust_index_for_additional_characters("“This is my (sentence. ”", 21) == 23
    assert adjust_index_for_additional_characters("“This is my (sentence. ” )", 21) == 25


def _invalid_endings(tokens):
    # same derivation as find_sentence_end_index (PrepareDocument.scala:363-371)
    inv = [t for t in tokens if len(t) > 1 and t[-1] == "."]
    inv.append("Ret.")
    return inv


@pytest.mark.parametrize(
    "a,i,expected",
    [
        # PrepareDocumentSpec:825-900 (isValidSentenceEnding)
        ("Test Mr.", 7, False),
        ("Test Ms.", 7, False),
        ("Test Jr.", 7, False),
        ("Test Sr.", 7, False),
        ("Test Sr..", 7, False),
        ("Test Rev.", 7, False),
        ("J. R. Tolkin is a writer.", 4, False),
        ("test", 2, False),
        ("test?", 4, True),
        ("test!", 4, True),
    ],
)
def test_is_valid_sentence_ending_spec_825(a, i, expected):
    tokens = tokenize_line(a)
    assert is_valid_sentence_ending(a, i, _invalid_endings(tokens)) is expected


def test_is_valid_sentence_ending_rejects_single_letter_spec_876():
    letters = "abcdefghijklmnoprstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ1234567890"
    for x in letters:
        a = "Test " + x + "."
        tokens = tokenize_line("Test ") + [x + "."]
        assert not is_valid_sentence_ending(a, 6, _invalid_endings(tokens))


def test_ends_with_invalid_spec_902():
    from commoncrawlscalatools_spark.functions.cleaner import _ends_with_invalid

    assert _ends_with_invalid("my sentence etwo", ["eone", "etwo"])
    assert not _ends_with_invalid("my sentence etwo.", ["eone", "etwo"])
