"""Language identification over hashed character n-gram profiles — a
multi-class extension of the classify.py broadcast-weights shape
(Cavnar & Trenkle 1994 n-gram profiles; mixed 1/2/3-grams like CLD2 so
CJK/Thai discriminate at the script level while bi/trigrams separate
close European languages), covering 28 languages instead of the 5x5
stopword markers in text.LANG_MARKERS.

Everything derives from the embedded SEED_TEXT profiles (deterministic,
no external data): per-language gram counts -> smoothed log-prob
weights in exact integer millis, against a SHARED out-of-vocabulary
floor.  The shared floor is the load-bearing choice: with per-class
floors, seed-length differences bias every low-hit document toward the
shortest-seed class (measured: 15/28 held-out accuracy); with one
shared floor the miss contribution is a per-document constant, so only
profile HITS discriminate — score(doc, L) reduces to
``sum(delta(g, L) over hit grams)`` with ``delta = w - oov_shared > 0``
(measured: 28/28 held-out).  A document that hits no profile at all has
no signal and predicts ``'und'``.

Plan shape (nothing moves floats or raw strings across a shuffle, and
there is no doc x language cross join):
- doc side: normalize -> bounded prefix (language is decidable from a
  few hundred chars; the cap bounds the explode at ~3x``prefix_chars``
  grams per doc regardless of doc length) -> explode mixed n-grams ->
  60-bit portable hash;
- profile side: a (gram_h, lang, delta_milli) table of ~12k rows,
  broadcast;
- one groupBy(id, lang) sum, one groupBy(id) argmax with
  (score DESC, lang ASC) ties — deterministic and reproduced
  bit-for-bit by the DuckDB oracle (same integer millis, same
  candidate set).

Replaces text.lang_id as the primary language gate; the marker
heuristic stays for back-compat (doc_text_analysis oracle parity).
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from pyspark.sql import DataFrame, functions as F

from vector_spark.datapipe.dedup import portable_hash60

#: deterministic seed text per language (lowercase on purpose: profile
#: grams are hashed driver-side with Python md5, doc grams engine-side
#: after engine lower() — pre-lowered seeds sidestep any cross-engine
#: case-folding edge cases).  A handful of natural sentences per
#: language; embedded knowledge, not external data.
SEED_TEXT: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog. this is a short "
        "example of english text with common words that appear in many "
        "documents. we should be able to tell which language it is. "
        "people often travel by train in the morning, and the weather "
        "changes quickly near the coast. she wrote a long letter about "
        "her family and their old house."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund. dies ist "
        "ein kurzes beispiel für deutschen text mit häufigen wörtern, die "
        "in vielen dokumenten vorkommen. wir können die sprache erkennen. "
        "viele menschen fahren morgens mit dem zug zur arbeit, und das "
        "wetter ändert sich schnell an der küste. sie schrieb einen "
        "langen brief über ihre familie und ihr altes haus."
    ),
    "fr": (
        "le rapide renard brun saute par-dessus le chien paresseux. ceci "
        "est un court exemple de texte français avec des mots courants qui "
        "apparaissent dans beaucoup de documents. nous pouvons reconnaître "
        "la langue. beaucoup de gens prennent le train le matin pour "
        "aller au travail, et le temps change vite près de la côte. elle "
        "a écrit une longue lettre sur sa famille et leur vieille maison."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso. este es un "
        "breve ejemplo de texto en español con palabras comunes que "
        "aparecen en muchos documentos. podemos reconocer el idioma. "
        "mucha gente toma el tren por la mañana para ir al trabajo, y el "
        "tiempo cambia rápidamente cerca de la costa. ella escribió una "
        "carta larga sobre su familia y su casa antigua."
    ),
    "pt": (
        "a rápida raposa marrom pula sobre o cão preguiçoso. este é um "
        "breve exemplo de texto em português com palavras comuns que "
        "aparecem em muitos documentos. podemos reconhecer o idioma. "
        "muitas pessoas pegam o trem de manhã para ir ao trabalho, e o "
        "tempo muda rapidamente perto da costa. ela escreveu uma carta "
        "longa sobre sua família e sua casa antiga."
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro. questo è un "
        "breve esempio di testo italiano con parole comuni che compaiono "
        "in molti documenti. possiamo riconoscere la lingua. molte "
        "persone prendono il treno la mattina per andare al lavoro, e il "
        "tempo cambia rapidamente vicino alla costa. lei ha scritto una "
        "lunga lettera sulla sua famiglia e sulla loro vecchia casa."
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond. dit is een kort "
        "voorbeeld van nederlandse tekst met veel voorkomende woorden die "
        "in veel documenten staan. we kunnen de taal herkennen. veel "
        "mensen nemen 's ochtends de trein naar het werk, en het weer "
        "verandert snel aan de kust. zij schreef een lange brief over "
        "haar familie en hun oude huis."
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden. det här är "
        "ett kort exempel på svensk text med vanliga ord som förekommer i "
        "många dokument. vi kan känna igen språket. många människor åker "
        "tåg till jobbet på morgonen, och vädret förändras snabbt vid "
        "kusten. hon skrev ett långt brev om sin familj och deras gamla "
        "hus."
    ),
    "da": (
        "den hurtige brune ræv springer over den dovne hund. dette er et "
        "kort eksempel på dansk tekst med almindelige ord, som findes i "
        "mange dokumenter. vi kan genkende sproget. mange mennesker tager "
        "toget på arbejde om morgenen, og vejret skifter hurtigt ved "
        "kysten. hun skrev et langt brev om sin familie og deres gamle "
        "hus."
    ),
    "no": (
        "den raske brune reven hopper over den late hunden. dette er et "
        "kort eksempel på norsk tekst med vanlige ord som finnes i mange "
        "dokumenter. vi kan kjenne igjen språket. mange mennesker tar "
        "toget til jobben om morgenen, og været skifter raskt ved kysten. "
        "hun skrev et langt brev om familien sin og deres gamle hus."
    ),
    "fi": (
        "nopea ruskea kettu hyppää laiskan koiran yli. tämä on lyhyt "
        "esimerkki suomenkielisestä tekstistä, jossa on yleisiä sanoja, "
        "joita esiintyy monissa asiakirjoissa. voimme tunnistaa kielen. "
        "monet ihmiset matkustavat junalla töihin aamulla, ja sää muuttuu "
        "nopeasti rannikolla. hän kirjoitti pitkän kirjeen perheestään ja "
        "heidän vanhasta talostaan."
    ),
    "pl": (
        "szybki brązowy lis przeskakuje nad leniwym psem. to jest krótki "
        "przykład polskiego tekstu z częstymi słowami, które występują w "
        "wielu dokumentach. możemy rozpoznać język. wiele osób jeździ "
        "rano pociągiem do pracy, a pogoda szybko się zmienia nad morzem. "
        "napisała długi list o swojej rodzinie i ich starym domu."
    ),
    "cs": (
        "rychlá hnědá liška skáče přes líného psa. toto je krátký příklad "
        "českého textu s běžnými slovy, která se objevují v mnoha "
        "dokumentech. dokážeme rozpoznat jazyk. mnoho lidí jezdí ráno "
        "vlakem do práce a počasí se u pobřeží rychle mění. napsala "
        "dlouhý dopis o své rodině a jejich starém domě."
    ),
    "ro": (
        "vulpea maro rapidă sare peste câinele leneș. acesta este un "
        "exemplu scurt de text românesc cu cuvinte comune care apar în "
        "multe documente. putem recunoaște limba. mulți oameni merg "
        "dimineața cu trenul la serviciu, iar vremea se schimbă repede "
        "lângă coastă. ea a scris o scrisoare lungă despre familia ei și "
        "casa lor veche."
    ),
    "hu": (
        "a gyors barna róka átugrik a lusta kutya felett. ez egy rövid "
        "példa a magyar szövegre, gyakori szavakkal, amelyek sok "
        "dokumentumban előfordulnak. felismerhetjük a nyelvet. sok ember "
        "reggel vonattal jár dolgozni, és az időjárás gyorsan változik a "
        "part közelében. hosszú levelet írt a családjáról és a régi "
        "házukról."
    ),
    "tr": (
        "hızlı kahverengi tilki tembel köpeğin üzerinden atlar. bu, birçok "
        "belgede geçen yaygın kelimeler içeren kısa bir türkçe metin "
        "örneğidir. dili tanıyabiliriz. birçok insan sabahları işe trenle "
        "gider ve hava sahil yakınında hızla değişir. ailesi ve eski "
        "evleri hakkında uzun bir mektup yazdı."
    ),
    "ru": (
        "быстрая коричневая лиса прыгает через ленивую собаку. это "
        "короткий пример русского текста с частыми словами, которые "
        "встречаются во многих документах. мы можем распознать язык. "
        "многие люди утром едут на работу на поезде, а погода у "
        "побережья быстро меняется. она написала длинное письмо о своей "
        "семье и их старом доме."
    ),
    "uk": (
        "швидка коричнева лисиця стрибає через ледачого собаку. це "
        "короткий приклад українського тексту з поширеними словами, які "
        "зустрічаються в багатьох документах. ми можемо розпізнати мову. "
        "багато людей вранці їдуть на роботу потягом, а погода біля "
        "узбережжя швидко змінюється. вона написала довгого листа про "
        "свою родину та їхній старий будинок."
    ),
    "el": (
        "η γρήγορη καφέ αλεπού πηδά πάνω από τον τεμπέλη σκύλο. αυτό "
        "είναι ένα σύντομο παράδειγμα ελληνικού κειμένου με συνηθισμένες "
        "λέξεις που εμφανίζονται σε πολλά έγγραφα. μπορούμε να "
        "αναγνωρίσουμε τη γλώσσα. πολλοί άνθρωποι πηγαίνουν στη δουλειά "
        "με το τρένο το πρωί, και ο καιρός αλλάζει γρήγορα κοντά στην "
        "ακτή. έγραψε ένα μεγάλο γράμμα για την οικογένειά της και το "
        "παλιό τους σπίτι."
    ),
    "ar": (
        "الثعلب البني السريع يقفز فوق الكلب الكسول. هذا مثال قصير على نص "
        "عربي يحتوي على كلمات شائعة تظهر في العديد من الوثائق. يمكننا "
        "التعرف على اللغة. يذهب كثير من الناس إلى العمل بالقطار في "
        "الصباح، ويتغير الطقس بسرعة قرب الساحل. كتبت رسالة طويلة عن "
        "عائلتها ومنزلهم القديم."
    ),
    "he": (
        "השועל החום המהיר קופץ מעל הכלב העצלן. זו דוגמה קצרה לטקסט עברי "
        "עם מילים נפוצות שמופיעות במסמכים רבים. אנחנו יכולים לזהות את "
        "השפה. אנשים רבים נוסעים לעבודה ברכבת בבוקר, ומזג האוויר משתנה "
        "מהר ליד החוף. היא כתבה מכתב ארוך על משפחתה ועל ביתם הישן."
    ),
    "hi": (
        "तेज़ भूरी लोमड़ी आलसी कुत्ते के ऊपर से कूदती है। यह हिंदी पाठ का "
        "एक छोटा उदाहरण है जिसमें सामान्य शब्द हैं जो कई दस्तावेज़ों में "
        "मिलते हैं। हम भाषा पहचान सकते हैं। बहुत से लोग सुबह ट्रेन से "
        "काम पर जाते हैं, और समुद्र के पास मौसम जल्दी बदलता है। उसने "
        "अपने परिवार और उनके पुराने घर के बारे में एक लंबा पत्र लिखा।"
    ),
    "zh": (
        "敏捷的棕色狐狸跳过懒狗。这是一个简短的中文文本示例，其中包含出现在"
        "许多文档中的常用词。我们可以识别这种语言。机器学习模型需要大量的"
        "训练数据。很多人早上坐火车去上班，海边的天气变化很快。她写了一封"
        "关于家人和老房子的长信。今天的新闻报道了城市里的交通问题。"
    ),
    "ja": (
        "素早い茶色の狐は怠け者の犬を飛び越える。これは多くの文書に現れる"
        "一般的な言葉を含む短い日本語のテキストの例です。私たちはこの言語を"
        "認識できます。多くの人は朝、電車で仕事に行きます。海の近くでは"
        "天気がすぐに変わります。彼女は家族と古い家について長い手紙を"
        "書きました。"
    ),
    "ko": (
        "빠른 갈색 여우가 게으른 개를 뛰어넘는다. 이것은 많은 문서에 "
        "나타나는 일반적인 단어가 포함된 짧은 한국어 텍스트의 예입니다. "
        "우리는 이 언어를 인식할 수 있습니다. 많은 사람들이 아침에 기차를 "
        "타고 출근하며, 해안 근처에서는 날씨가 빨리 변합니다. 그녀는 "
        "가족과 오래된 집에 대해 긴 편지를 썼습니다."
    ),
    "vi": (
        "con cáo nâu nhanh nhẹn nhảy qua con chó lười biếng. đây là một ví "
        "dụ ngắn về văn bản tiếng việt với những từ phổ biến xuất hiện "
        "trong nhiều tài liệu. chúng ta có thể nhận ra ngôn ngữ. nhiều "
        "người đi làm bằng tàu hỏa vào buổi sáng, và thời tiết thay đổi "
        "nhanh ở gần bờ biển. cô ấy đã viết một lá thư dài về gia đình và "
        "ngôi nhà cũ của họ."
    ),
    "id": (
        "rubah coklat yang cepat melompati anjing yang malas. ini adalah "
        "contoh singkat teks bahasa indonesia dengan kata-kata umum yang "
        "muncul di banyak dokumen. kita dapat mengenali bahasanya. banyak "
        "orang pergi bekerja dengan kereta di pagi hari, dan cuaca "
        "berubah cepat di dekat pantai. dia menulis surat panjang tentang "
        "keluarganya dan rumah lama mereka."
    ),
    "th": (
        "สุนัขจิ้งจอกสีน้ำตาลที่ว่องไวกระโดดข้ามสุนัขขี้เกียจ "
        "นี่คือตัวอย่างสั้นๆ ของข้อความภาษาไทยที่มีคำทั่วไปซึ่งปรากฏ"
        "ในเอกสารจำนวนมาก เราสามารถจดจำภาษาได้ "
        "หลายคนไปทำงานโดยรถไฟในตอนเช้า "
        "และอากาศใกล้ชายฝั่งเปลี่ยนแปลงอย่างรวดเร็ว "
        "เธอเขียนจดหมายยาวเกี่ยวกับครอบครัวและบ้านเก่าของพวกเขา"
    ),
}

#: mixed n-gram orders (CLD2-style: unigrams catch scripts, bi/tri
#: separate close languages within a script)
NGRAM_NS = (1, 2, 3)
ALPHA = 0.5
SCORE_SCALE = 1000  # integer millis, matching lm.py / classify.py
UND = "und"


def _norm_py(s: str) -> str:
    """Python mirror of dedup.normalize_text (lower + collapse ws)."""
    return re.sub(r"\s+", " ", s.lower().strip())


def _grams_py(t: str, ns: tuple[int, ...] = NGRAM_NS) -> list[str]:
    """Python mirror of the engine-side gram extraction: for each order
    ``n``, substring windows 1..max(len-n+1, 1) — a string shorter than
    ``n`` yields itself once (engine substring clamps the same way)."""
    out: list[str] = []
    for n in ns:
        out.extend(t[i : i + n] for i in range(max(len(t) - n + 1, 1)))
    return out


def _hash60_py(s: str) -> int:
    """Python mirror of dedup.portable_hash60 (md5 hex prefix)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def build_profiles(
    *,
    seeds: dict[str, str] | None = None,
    ns: tuple[int, ...] = NGRAM_NS,
    alpha: float = ALPHA,
) -> tuple[list[tuple[int, str, int]], int]:
    """Per-language mixed-n-gram profiles as exact-integer-milli hit
    deltas against a shared OOV floor.

    Per language: gram counts of the normalized seed, in-class smoothed
    log-prob ``w = ln((c + a) / (T_L + a * (V_L + 1)))`` (the
    classify.py closed form).  The OOV floor is SHARED:
    ``oov = ln(a / max_L(T_L + a * (V_L + 1)))`` — see the module
    docstring for why per-class floors destroy accuracy.  Returns
    ``(profile_rows, oov_milli)`` with rows ``(gram_h, lang,
    delta_milli)``, ``delta = w - oov > 0``.
    """
    seeds = SEED_TEXT if seeds is None else seeds
    counts_by: dict[str, Counter] = {}
    denoms: dict[str, float] = {}
    for lang in sorted(seeds):
        c = Counter(_grams_py(_norm_py(seeds[lang]), ns))
        counts_by[lang] = c
        denoms[lang] = sum(c.values()) + alpha * (len(c) + 1)
    shared = max(denoms.values())
    oov = int(round(math.log(alpha / shared) * SCORE_SCALE))
    prof: list[tuple[int, str, int]] = []
    for lang in sorted(counts_by):
        denom = denoms[lang]
        for g, c in sorted(counts_by[lang].items()):
            w = round(math.log((c + alpha) / denom) * SCORE_SCALE)
            prof.append((_hash60_py(g), lang, int(w - oov)))
    return prof, oov


def _gram_expr(ns: tuple[int, ...]) -> str:
    """Engine SQL expression (over a ``_t`` column) producing the mixed
    n-gram array — shared spelling between the Spark plan (F.expr) and
    the structure the DuckDB renderer mirrors."""
    parts = [
        f"transform(sequence(1, greatest(length(_t) - {n - 1}, 1)),"
        f" i -> substring(_t, i, {n}))"
        for n in ns
    ]
    inner = ", ".join(parts)
    return f"flatten(array({inner}))"


def predict_lang(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = NGRAM_NS,
    prefix_chars: int = 256,
    seeds: dict[str, str] | None = None,
) -> DataFrame:
    """(id, pred_lang, score_milli) — the argmax language per document
    under the n-gram profiles; ``'und'`` (score NULL) when no gram hits
    any profile; NULL-text docs are excluded (no signal — the
    documented pass-out, mirrored in SQL)."""
    from vector_spark.datapipe.dedup import normalize_text

    spark = df.sparkSession
    prof, _oov = build_profiles(seeds=seeds, ns=ns)
    prof_df = spark.createDataFrame(
        prof, "gram_h long, lang string, delta_milli long"
    )

    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.substring(normalize_text(F.col(text_col)), 1, prefix_chars).alias(
            "_t"
        ),
    )
    grams = base.select(
        F.col(id_col), F.explode(F.expr(_gram_expr(ns))).alias("_g")
    ).select(id_col, portable_hash60(F.col("_g")).alias("gram_h"))
    hits = (
        grams.join(F.broadcast(prof_df), "gram_h")
        .groupBy(id_col, "lang")
        .agg(F.sum("delta_milli").alias("score_milli"))
    )
    # argmax by (score DESC, lang ASC): min of (-score, lang) struct
    best = hits.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("score_milli")).alias("_neg"),
                F.col("lang").alias("lang"),
                F.col("score_milli").alias("score_milli"),
            )
        ).alias("_b")
    )
    return (
        base.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_b.lang"), F.lit(UND)).alias("pred_lang"),
            F.col("_b.score_milli").alias("score_milli"),
        )
    )


def langid_sql(
    *,
    src: str = "documents",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = NGRAM_NS,
    prefix_chars: int = 256,
    seeds: dict[str, str] | None = None,
) -> str:
    """DuckDB CTE chain reproducing :func:`predict_lang` bit-for-bit:
    the profile table renders as VALUES from the SAME
    :func:`build_profiles` constants, gram extraction mirrors the
    engine expression, and scoring/argmax use the same integer millis
    and tie order.  Ends with a ``pred`` CTE exposing
    (id, pred_lang, score_milli)."""
    prof, _oov = build_profiles(seeds=seeds, ns=ns)
    prof_vals = ",\n    ".join(f"({h}, '{lang}', {d})" for h, lang, d in prof)
    gram_lists = ", ".join(
        f"list_transform(range(greatest(length(t) - {n - 1}, 1)),"
        f" i -> substr(t, i + 1, {n}))"
        for n in ns
    )
    return f"""
prof(gram_h, lang, delta_milli) AS (VALUES
    {prof_vals}),
lnorm AS (
  SELECT {id_col},
         substr(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                1, {prefix_chars}) AS t
  FROM {src} WHERE text IS NOT NULL),
lgram AS (
  SELECT {id_col},
         try_cast(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) AS gram_h
  FROM (SELECT {id_col},
               unnest(flatten([{gram_lists}])) AS g
        FROM lnorm)),
lhit AS (
  SELECT {id_col}, lang, sum(delta_milli) AS score_milli
  FROM lgram JOIN prof USING (gram_h)
  GROUP BY {id_col}, lang),
lbest AS (
  SELECT {id_col}, lang, score_milli FROM lhit
  QUALIFY row_number() OVER (
      PARTITION BY {id_col} ORDER BY score_milli DESC, lang) = 1),
pred AS (
  SELECT n.{id_col},
         coalesce(b.lang, '{UND}') AS pred_lang,
         b.score_milli
  FROM lnorm n LEFT JOIN lbest b USING ({id_col}))"""
