"""Topic / spam classifiers (converting-process classifier package).

AdHoc keyword-weight detectors (AdHocDetector.java:14-52): term weights
are summed over the document's stemmed words with the 0.5*a+b repeat
merge and a sqrt length penalty.  The term-weight lists below are the
reference's published constants (RecipeDetector.java /
TextileCraftDetector.java / WoodworkingDetector.java), extracted
mechanically; words are stemmed at import with the same Porter
algorithm the reference uses.

GoogleAnwersSpamDetector.java:7-36: >4 headings at one level starting
with a question word, and more than half of that level's headings.
"""

from __future__ import annotations

from math import sqrt

from .stem import porter_stem

AVG_LENGTH = 1000  # AdHocDetector.java:15

RECIPE_TERMS = {
    'ingredients': 0.3,
    'recipe': 0.1,
    'preparations': 0.1,
    'instructions': 0.1,
    'menu': -0.5,
    'email': -0.15,
    'checkout': -0.15,
    'reviews': -0.15,
    'newsletter': -0.15,
    'dl': 0.05,
    'l': 0.05,
    'g': 0.05,
    'ml': 0.05,
    'tsp': 0.05,
    'teaspoons': 0.05,
    'tbsp': 0.05,
    'tablespoons': 0.05,
    'cups': 0.05,
    'quarts': 0.05,
    'pints': 0.05,
    'grate': 0.05,
    'cut': 0.05,
    'peel': 0.05,
    'chop': 0.05,
    'slice': 0.05,
    'debone': 0.05,
    'julienne': 0.05,
    'saute': 0.05,
    'fry': 0.05,
    'boil': 0.05,
    'parboil': 0.05,
    'roast': 0.05,
    'grill': 0.05,
    'sear': 0.05,
    'heat': 0.05,
    'dice': 0.05,
    'bake': 0.05,
    'strain': 0.05,
    'melt': 0.05,
    'garnish': 0.05,
    'preheat': 0.05,
    'sprinkle': 0.05,
    'spritz': 0.05,
    'colander': 0.05,
    'pot': 0.05,
    'pan': 0.05,
    'oven': 0.05,
    'stove': 0.05,
    'skillet': 0.05,
    'wok': 0.05,
    'knife': 0.05,
    'grater': 0.05,
    'yeast': 0.025,
    'sourdough': 0.025,
    'flour': 0.025,
    'sugar': 0.025,
    'rye': 0.025,
    'wheat': 0.025,
    'dough': 0.025,
    'rise': 0.025,
    'lettuce': 0.025,
    'onions': 0.025,
    'parsnips': 0.025,
    'beets': 0.025,
    'carrots': 0.025,
    'chilies': 0.025,
    'peppers': 0.025,
    'chives': 0.025,
    'tomatoes': 0.025,
    'salad': 0.025,
    'leeks': 0.025,
    'shallots': 0.025,
    'avocado': 0.025,
    'asparagus': 0.025,
    'cucumbers': 0.025,
    'eggplants': 0.025,
    'broccoli': 0.025,
    'kale': 0.025,
    'jalapeno': 0.025,
    'habanero': 0.025,
    'mushrooms': 0.025,
    'shiitake': 0.025,
    'chanterelles': 0.025,
    'meat': 0.025,
    'beef': 0.025,
    'chicken': 0.025,
    'turkey': 0.025,
    'cheese': 0.025,
    'pork': 0.025,
    'tofu': 0.025,
    'salmon': 0.025,
    'cod': 0.025,
    'veal': 0.025,
    'eggs': 0.025,
    'lentils': 0.025,
    'chickpeas': 0.025,
    'rice': 0.025,
    'noodles': 0.025,
    'beans': 0.025,
    'ramen': 0.025,
    'miso': 0.025,
    'natto': 0.025,
    'udon': 0.025,
    'soba': 0.025,
    'shichimi': 0.025,
    'nori': 0.025,
    'kimchi': 0.025,
    'salt': 0.025,
    'oil': 0.025,
    'olive': 0.025,
    'feta': 0.025,
    'parmesan': 0.025,
    'mozzarella': 0.025,
    'gouda': 0.025,
    'cheese': 0.025,
    'mayonnaise': 0.025,
    'butter': 0.025,
    'pepper': 0.025,
    'garlic': 0.025,
    'sriracha': 0.025,
    'sambal': 0.025,
    'soy': 0.025,
    'cumin': 0.025,
    'thyme': 0.025,
    'basil': 0.025,
    'oregano': 0.025,
    'cilantro': 0.025,
    'ginger': 0.025,
    'curry': 0.025,
    'water': 0.025,
    'lemons': 0.025,
    'melons': 0.025,
    'cherries': 0.025,
    'apples': 0.025,
    'pears': 0.025,
    'chocolate': 0.025,
    'vanilla': 0.025,
    'milk': 0.025,
    'creamer': 0.025,
    'quark': 0.025,
    'cream': 0.025,
    'cake': 0.025,
    'pie': 0.025,
    'crust': 0.025,
    'bread': 0.025,
    'omelet': 0.025,
    'soup': 0.025,
}

TEXTILE_TERMS = {
    'shop': -0.1,
    'newsletter': -0.1,
    'cart': -0.1,
    'item': -0.025,
    'price': -0.1,
    'book': -0.1,
    'order': -0.1,
    'exhibition': -0.1,
    'knit': 0.05,
    'stitch': 0.05,
    'yarn': 0.05,
    'crochet': 0.05,
    'ravelry': 0.15,
    'stockinette': 0.075,
    'purl': 0.075,
    'ksp': 0.075,
    'kwise': 0.075,
    'k2tog': 0.075,
    'k1b': 0.075,
    'psso': 0.075,
    'p2sso': 0.075,
    'pwise': 0.075,
    'yrn': 0.075,
    'yon': 0.075,
    'entrelac': 0.075,
    'thrum': 0.075,
    'bobbin': 0.025,
    'boucle': 0.075,
    'lopi': 0.075,
    'eyelash': 0.01,
    'variegated': 0.075,
    'serge': 0.04,
    'selvage': 0.075,
    'topstitch': 0.075,
    'gauge': 0.01,
    'design': 0.01,
    'pattern': 0.01,
    'layer': 0.01,
    'color': 0.01,
    'colour': 0.01,
    'chart': 0.01,
    'grid': 0.01,
    'wool': 0.01,
    'acrylic': 0.01,
    'loose': 0.01,
    'loop': 0.01,
    'needle': 0.01,
    'row': 0.01,
    'circular': 0.01,
    'sew': 0.01,
    'size': 0.01,
    'repeat': 0.01,
    'repetition': 0.01,
    'basketweave': 0.01,
    'weave': 0.01,
    'loom': 0.01,
    'warp': 0.01,
    'weft': 0.01,
    'shuttle': 0.01,
    'brioche': 0.01,
    'spool': 0.01,
    'hem': 0.01,
    'bodice': 0.01,
    'seam': 0.01,
    'allowance': 0.01,
    'crinoline': 0.01,
    'petticoat': 0.01,
    'armscye': 0.01,
    'baste': 0.01,
    'cord': 0.01,
    'darning': 0.01,
    'draping': 0.01,
    'embroider': 0.01,
    'eyelet': 0.01,
    'godet': 0.01,
    'gore': 0.01,
    'grain': 0.01,
    'jersey': 0.01,
    'lining': 0.01,
    'muslin': 0.01,
    'needlework': 0.01,
    'pleat': 0.01,
    'quilt': 0.01,
    'silk': 0.01,
    'sloper': 0.01,
    'surplice': 0.01,
    'thread': 0.01,
    'twill': 0.01,
    'ch': 0.01,
    'sp': 0.01,
    'sl': 0.01,
    'sc': 0.01,
    'ss': 0.01,
    'hdc': 0.01,
    'turn': 0.01,
    'skip': 0.01,
    'round': 0.01,
    'ring': 0.01,
    'sequin': 0.01,
    'bobble': 0.01,
    'puff': 0.01,
    'v-stitch': 0.01,
}

WOODWORKING_TERMS = {
    'shop': -0.1,
    'newsletter': -0.1,
    'cart': -0.1,
    'item': -0.025,
    'price': -0.1,
    'book': -0.1,
    'order': -0.1,
    'exhibition': -0.1,
    'apse': 0.01,
    'baluster': 0.01,
    'beam': 0.01,
    'cornice': 0.01,
    'drill': 0.01,
    'nail': 0.01,
    'saw': 0.01,
    'hacksaw': 0.01,
    'bandsaw': 0.01,
    'whipsaw': 0.01,
    'gimlet': 0.01,
    'clamp': 0.01,
    'glue': 0.01,
    'cut': 0.01,
    'plane': 0.01,
    'sand': 0.01,
    'bevel': 0.01,
    'chamfer': 0.01,
    'dado': 0.075,
    'dowel': 0.05,
    'dovetail': 0.05,
    'joint': 0.01,
    'level': 0.01,
    'edge': 0.01,
    'face': 0.01,
    'fibreboard': 0.01,
    'fiberboard': 0.01,
    'battens': 0.01,
    'furring': 0.01,
    'glulam': 0.025,
    'hardboard': 0.025,
    'hardwood': 0.01,
    'jamb': 0.015,
    'kerf': 0.025,
    'lvl': 0.025,
    'laminated': 0.01,
    'lignin': 0.01,
    'mitre': 0.01,
    'mortise': 0.015,
    'mullion': 0.01,
    'newel': 0.01,
    'nogging': 0.01,
    'ogee': 0.01,
    'ogive': 0.01,
    'ovolo': 0.01,
    'drawknife': 0.01,
    'plywood': 0.01,
    'purlin': 0.01,
    'riser': 0.01,
    'sapwood': 0.01,
    'shingle': 0.01,
    'softwood': 0.01,
    'sapwood': 0.01,
    'stave': 0.01,
    'stopper': 0.01,
    'stud': 0.01,
    'transom': 0.01,
    'v-joint': 0.015,
    'veneer': 0.01,
    'quartersaw': 0.015,
    'screw': 0.01,
    'woodturning': 0.01,
    'pine': 0.005,
    'balsa': 0.01,
    'poplar': 0.005,
    'nut': 0.01,
    'bolt': 0.01,
    'tack': 0.01,
    'hinge': 0.01,
    'brass': 0.01,
    'fitting': 0.01,
    'diy': 0.015,
    'dozuki': 0.01,
}


def _stemmed(terms: dict) -> dict:
    out: dict[str, float] = {}
    for w, v in terms.items():
        out[porter_stem(w)] = v  # last wins, like repeated map puts
    return out


_DETECTORS = None


def _detectors() -> dict:
    global _DETECTORS
    if _DETECTORS is None:
        _DETECTORS = {
            "recipe": _stemmed(RECIPE_TERMS),
            "textile": _stemmed(TEXTILE_TERMS),
            "woodworking": _stemmed(WOODWORKING_TERMS),
        }
    return _DETECTORS


def adhoc_test_p(stemmed_words: list[str], term_values: dict) -> float:
    """AdHocDetector.testP: repeat hits merge as 0.5*a+b; the final score
    is the sum over distinct hit terms times sqrt(1000/max(1000, n))."""
    values: dict[str, float] = {}
    count = 0
    for s in stemmed_words:
        count += 1
        v = term_values.get(s)
        if v is not None:
            prev = values.get(s)
            values[s] = v if prev is None else 0.5 * prev + v
    if count == 0:
        return 0.0
    return sum(values.values()) * (sqrt(AVG_LENGTH) / sqrt(max(AVG_LENGTH, count)))


_STEM_CACHE: dict[str, str] = {}
_STEM_CACHE_MAX = 200_000


def _stem_cached(w: str) -> str:
    s = _STEM_CACHE.get(w)
    if s is None:
        if len(_STEM_CACHE) > _STEM_CACHE_MAX:
            _STEM_CACHE.clear()
        s = _STEM_CACHE[w] = porter_stem(w)
    return s


def topic_categories(words: list[str]) -> tuple[bool, bool]:
    """-> (CATEGORY_FOOD, CATEGORY_CRAFTS) per FeatureExtractor.java:343-347:
    recipe>0.5 wins; else woodworking>0.3 or textile>0.3 -> crafts
    (mutually exclusive).  Stems are memoized per worker (word frequency
    is zipfian, so the cache hit rate is ~1 after the first few docs)."""
    stemmed = [_stem_cached(w.lower()) for w in words]
    d = _detectors()
    if adhoc_test_p(stemmed, d["recipe"]) > 0.5:
        return True, False
    if (
        adhoc_test_p(stemmed, d["woodworking"]) > 0.3
        or adhoc_test_p(stemmed, d["textile"]) > 0.3
    ):
        return False, True
    return False, False


GA_PREFIXES = ("What", "Why", "How", "When", "Is")


def google_answers_spam(headings_by_level: dict) -> bool:
    """GoogleAnwersSpamDetector.testP > 0.5: some heading level h1/h2/h3
    has >4 question-prefixed headings making up more than half of it.
    ``headings_by_level``: level -> (positive, total)."""
    for lvl in (1, 2, 3):
        positive, total = headings_by_level.get(lvl, (0, 0))
        if positive > 4 and total and positive / total > 0.5:
            return True
    return False
