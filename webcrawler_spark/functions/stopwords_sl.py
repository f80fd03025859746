"""The reference's Slovene stopword list (F12), ported verbatim as data.

Reference: ``implementation-indexing/stopwords.py:1-42`` builds
``stop_words_slovene = set(nltk.stopwords.words("slovene")) | {…explicit…}``.
nltk (and its corpus downloads) are not available in this container, so
this module carries the reference's explicit list only; the nltk-slovene
base list overlaps it almost entirely (both are the standard Slovene
function-word inventory), and the test suite documents the resulting
vocabulary delta against the reference's published 48,081-word count.
"""

from __future__ import annotations

STOPWORDS_SL_FULL = frozenset(
    ["ter", "nov", "novo", "nova", "zato", "še", "zaradi", "a", "ali", "april",
     "avgust", "b", "bi", "bil", "bila", "bile", "bili", "bilo", "biti",
     "blizu", "bo", "bodo", "bojo", "bolj", "bom", "bomo", "boste", "bova",
     "boš", "brez", "c", "cel", "cela", "celi", "celo", "d", "da", "daleč",
     "dan", "danes", "datum", "december", "deset", "deseta", "deseti",
     "deseto", "devet", "deveta", "deveti", "deveto", "do", "dober", "dobra",
     "dobri", "dobro", "dokler", "dol", "dolg", "dolga", "dolgi", "dovolj",
     "drug", "druga", "drugi", "drugo", "dva", "dve", "e", "eden", "en",
     "ena", "ene", "eni", "enkrat", "eno", "etc.", "f", "februar", "g", "g.",
     "ga", "ga.", "gor", "gospa", "gospod", "h", "halo", "i", "idr.", "ii",
     "iii", "in", "iv", "ix", "iz", "j", "januar", "jaz", "je", "ji", "jih",
     "jim", "jo", "julij", "junij", "jutri", "k", "kadarkoli", "kaj",
     "kajti", "kako", "kakor", "kamor", "kamorkoli", "kar", "karkoli",
     "katerikoli", "kdaj", "kdo", "kdorkoli", "ker", "ki", "kje", "kjer",
     "kjerkoli", "ko", "koder", "koderkoli", "koga", "komu", "kot", "kratek",
     "kratka", "kratke", "kratki", "l", "lahka", "lahke", "lahki", "lahko",
     "le", "lep", "lepa", "lepe", "lepi", "lepo", "leto", "m", "maj",
     "majhen", "majhna", "majhni", "malce", "malo", "manj", "marec", "me",
     "med", "medtem", "mene", "mesec", "mi", "midva", "midve", "mnogo",
     "moj", "moja", "moje", "mora", "morajo", "moram", "moramo", "morate",
     "moraš", "morem", "mu", "n", "na", "nad", "naj", "najina", "najino",
     "najmanj", "naju", "največ", "nam", "narobe", "nas", "nato", "nazaj",
     "naš", "naša", "naše", "ne", "nedavno", "nedelja", "nek", "neka",
     "nekaj", "nekatere", "nekateri", "nekatero", "nekdo", "neke", "nekega",
     "neki", "nekje", "neko", "nekoga", "nekoč", "ni", "nikamor", "nikdar",
     "nikjer", "nikoli", "nič", "nje", "njega", "njegov", "njegova",
     "njegovo", "njej", "njemu", "njen", "njena", "njeno", "nji", "njih",
     "njihov", "njihova", "njihovo", "njiju", "njim", "njo", "njun", "njuna",
     "njuno", "no", "nocoj", "november", "npr.", "o", "ob", "oba", "obe",
     "oboje", "od", "odprt", "odprta", "odprti", "okoli", "oktober", "on",
     "onadva", "one", "oni", "onidve", "osem", "osma", "osmi", "osmo",
     "oz.", "p", "pa", "pet", "peta", "petek", "peti", "peto", "po", "pod",
     "pogosto", "poleg", "poln", "polna", "polni", "polno", "ponavadi",
     "ponedeljek", "ponovno", "potem", "povsod", "pozdravljen",
     "pozdravljeni", "prav", "prava", "prave", "pravi", "pravo", "prazen",
     "prazna", "prazno", "prbl.", "precej", "pred", "prej", "preko", "pri",
     "pribl.", "približno", "primer", "pripravljen", "pripravljena",
     "pripravljeni", "proti", "prva", "prvi", "prvo", "r", "ravno", "redko",
     "res", "reč", "s", "saj", "sam", "sama", "same", "sami", "samo", "se",
     "sebe", "sebi", "sedaj", "sedem", "sedma", "sedmi", "sedmo", "sem",
     "september", "seveda", "si", "sicer", "skoraj", "skozi", "slab", "smo",
     "so", "sobota", "spet", "sreda", "srednja", "srednji", "sta", "ste",
     "stran", "stvar", "sva", "t", "ta", "tak", "taka", "take", "taki",
     "tako", "takoj", "tam", "te", "tebe", "tebi", "tega", "težak", "težka",
     "težki", "težko", "ti", "tista", "tiste", "tisti", "tisto", "tj.",
     "tja", "to", "toda", "torek", "tretja", "tretje", "tretji", "tri",
     "tu", "tudi", "tukaj", "tvoj", "tvoja", "tvoje", "u", "vaju", "vam",
     "vas", "vaš", "vaša", "vaše", "v", "ve", "vedno", "velik", "velika",
     "veliki", "veliko", "vendar", "ves", "več", "vi", "vidva", "vii",
     "viii", "visok", "visoka", "visoke", "visoki", "vsa", "vsaj", "vsak",
     "vsaka", "vsakdo", "vsake", "vsaki", "vsakomur", "vse", "vsega", "vsi",
     "vso", "včasih", "včeraj", "x", "z", "za", "zadaj", "zadnji", "zakaj",
     "zaprta", "zaprti", "zaprto", "zdaj", "zelo", "zunaj", "č", "če",
     "često", "četrta", "četrtek", "četrti", "četrto", "čez", "čigav", "š",
     "šest", "šesta", "šesti", "šesto", "štiri", "ž", "že", "svoj", "jesti",
     "imeti", "iti", "kak", "www", "km", "eur", "pač", "del", "kljub",
     "šele", "prek", "znova", "morda", "kateri", "katero", "katera",
     "ampak", "lahek", "morati", "torej"]
)

# The reference's RUNTIME stopword set is the union of the explicit list
# above with ``nltk.corpus.stopwords.words("slovene")``
# (implementation-indexing/stopwords.py:2-4). The nltk corpus data file is
# not in this container; these are the members of it RECOVERED from the
# reference's own published artifacts: each word appears in our
# otherwise byte-exact token stream but is absent from the corresponding
# published snippet window (implementation-indexing/report/*.png), which
# proves the reference's filter dropped it. Every entry cites the window
# that evidences it; tests/test_real_corpus_index.py re-derives each one.
# nltk-slovene members that never border a published window cannot be
# recovered offline — that unrecovered tail is exactly the remaining
# vocabulary delta (ours 48,398 vs published 48,081, +0.66%).
NLTK_SLOVENE_EVIDENCED = frozenset(
    ["oziroma",    # davcna_olajsava.png evem.7 w1: "39 50 20" (ours kept: "50 oziroma 20")
     "katerimi",   # podatki.png e-prostor.57 w3: "dostopne geodetske podatke" vs "geodetske podatke katerimi"
     "druge",      # predelovalne_dejavnosti.png evem.371 w2: "tehnologijo 32 raznovrstne" vs "32 druge raznovrstne"
     "katere",     # predelovalne_dejavnosti.png evem.452 w3: "dejavnosti storitve predpisani" vs "dejavnosti storitve katere"
     "drugih",     # trgovina.png evem.651 w1-2: "trgovina drobno specializiranih" vs "trgovina drobno drugih"
     "drugimi",    # trgovina.png evem.623 w1 / evem.327 w1: "trgovina debelo izdelki" vs "trgovina debelo drugimi"
     "nismo",      # predelovalne_dejavnosti.png evem.398 w3: "dejavnosti sloveniji presegli" vs "sloveniji nismo"
     "niso",       # predelovalne_dejavnosti.png evem.28 w2: "pravne osebe posamezne" vs "osebe niso posamezne"
     "predvsem"]   # predelovalne_dejavnosti.png evem.28 w5: "zasebnega zavoda število" vs "zavoda predvsem število"
)

# What the reference's `stop_words_slovene` evaluates to at runtime, as
# closely as it can be reconstructed without the nltk data file.
STOPWORDS_SL_RUNTIME = STOPWORDS_SL_FULL | NLTK_SLOVENE_EVIDENCED
