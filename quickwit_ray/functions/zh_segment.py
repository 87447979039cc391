"""Dictionary-based Chinese word segmentation (lindera/CC-CEDICT analog).

The reference's multilang tokenizer segments Mandarin with lindera over
the CC-CEDICT dictionary (`quickwit-query/src/tokenizers/multilang.rs`).
Neither lindera nor CC-CEDICT is installable here, so this module
implements the standard maximum-probability segmentation algorithm (the
jieba/DAG formulation of the same lattice-Viterbi idea `ja_segment.py`
uses for Japanese) over a small vendored lexicon of frequent Chinese
words — public common-vocabulary knowledge, frequencies hand-assigned to
mirror published frequency orderings.

Algorithm: build a DAG of every dictionary word starting at each
position, then a right-to-left dynamic program maximizes
sum(log(freq(w)/total)) over the segmentation. A route with fewer,
more frequent words wins; classic ambiguities resolve the standard way
(研究/生命/的/起源 not 研究生/命/…, 南京市/长江大桥 not 南京/市长/…).

Documented divergences from lindera/CC-CEDICT:

* The lexicon is a few hundred words, not 120k: out-of-vocabulary runs
  split PER CHARACTER (lindera's unknown-word behavior for CJK), so the
  reference golden `test_multilanguage_tokenizer_cmn` reproduces exactly
  (19 tokens — 字元/阿爾發 are OOV there too). Indexing degrades
  gracefully: queries tokenize identically to documents.
* No HMM for OOV words (jieba's new-word discovery) — lindera doesn't
  do that either.
* Both simplified and traditional forms are listed only for the words
  the vendored lexicon carries; CC-CEDICT keys traditional with
  simplified variants.
"""

from __future__ import annotations

from math import log

# word -> relative frequency (arbitrary units; mirrors published
# frequency ordering: function words >> common nouns >> rare words)
_FREQ: dict[str, int] = {}


def _add(freq: int, *words: str) -> None:
    for w in words:
        _FREQ.setdefault(w, freq)


# -- single-character function words / high-frequency characters ------------
_add(80000, "的", "了", "是", "在", "我", "有", "他", "这", "这", "不")
_add(50000, "人", "们", "你", "来", "个", "中", "大", "上", "国", "到",
     "说", "就", "去", "得", "也", "和", "那", "要", "下", "看", "天",
     "时", "过", "出", "小", "么", "起", "好", "把", "问", "都", "很",
     "与", "與", "给", "地", "她", "它", "为", "以", "会", "能", "可")
_add(20000, "年", "月", "日", "山", "水", "火", "木", "金", "土", "一",
     "二", "三", "四", "五", "六", "七", "八", "九", "十", "百", "千",
     "万", "爱", "愛", "家", "再", "又", "还", "最", "只", "被", "从",
     "对", "里", "后", "前", "多", "少", "高", "长", "新", "老", "打",
     "几", "两", "没", "已", "更", "别", "些", "者", "所", "而", "之")
# characters that appear mostly inside words get LOW standalone
# frequency so dictionary words beat per-char routes (研究/生命 beats
# 研究生/命 because standalone 命 is rare)
_add(200, "命", "华", "江", "市", "京", "研", "究", "生", "学", "气",
     "明", "电", "话", "题", "息", "阿", "尔", "标", "准", "效", "含")

# -- two-character words -----------------------------------------------------
_add(20000, "我们", "你们", "他们", "什么", "没有", "可以", "知道",
     "现在", "时候", "因为", "所以", "如果", "这个", "那个", "已经",
     "还是", "但是", "自己", "今天", "明天", "昨天", "时间", "工作",
     "问题", "觉得", "东西", "事情", "地方", "世界", "生活", "孩子",
     "朋友", "喜欢", "希望", "开始", "一起", "一个", "大家", "认为")
_add(12000, "中国", "北京", "上海", "南京", "美国", "日本", "英国",
     "天气", "学校", "学生", "老师", "大学", "公司", "国家", "城市",
     "地址", "包含", "包括", "符号", "符號", "标准", "標準", "无效",
     "無效", "有效", "研究", "科学", "技术", "技術", "经济", "經濟",
     "文化", "历史", "歷史", "教育", "医生", "音乐", "音樂", "电影",
     "电话", "電話", "电脑", "電腦", "手机", "手機", "网络", "網絡")
_add(8000, "来到", "來到", "回到", "走到", "看到", "听到", "找到",
     "得到", "想到", "遇到", "生命", "起源", "自然", "环境", "環境",
     "社会", "社會", "政府", "市场", "市場", "发展", "發展", "建设",
     "管理", "服务", "服務", "信息", "数据", "數據", "系统", "系統",
     "搜索", "索引", "文档", "文件", "语言", "語言", "中文", "英文",
     "日文", "翻译", "翻譯", "计算", "計算", "机器", "機器", "学习",
     "學習", "智能", "模型", "训练", "訓練", "分词", "分詞", "词典",
     "詞典", "字典", "山水", "风景", "風景", "长江", "長江", "黄河",
     "大桥", "大橋", "大厦", "大廈", "网易", "城门", "天安门", "清华")
_add(4000, "市长", "市長", "研究生", "大学生", "留学生", "科学家",
     "工程师", "程序员", "艺术家", "音乐家")

# -- longer words ------------------------------------------------------------
_add(6000, "清华大学", "北京大学", "南京大学", "人民共和国",
     "中华人民共和国", "天安门广场", "长江大桥", "長江大橋",
     "南京市", "北京市", "上海市", "互联网", "计算机", "計算機",
     "图书馆", "圖書館", "飞机场", "火车站", "人工智能", "机器学习",
     "自然语言", "操作系统", "数据库", "搜索引擎", "办公室",
     "差不多", "对不起", "没关系", "不客气", "为什么", "怎么样")

_TOTAL = float(sum(_FREQ.values()))
_LOG_TOTAL = log(_TOTAL)
# log-prob per word; OOV single characters get frequency 1
_LOGP: dict[str, float] = {w: log(f) - _LOG_TOTAL for w, f in _FREQ.items()}
_OOV_LOGP = 0.0 - _LOG_TOTAL
_MAX_WORD = max(len(w) for w in _FREQ)


def segment(text: str) -> list[str]:
    """Maximum-probability segmentation of one Chinese (CJK) run."""
    n = len(text)
    if n == 0:
        return []
    if n == 1:
        return [text]
    # route[i] = (best total log-prob of text[i:], end of first word)
    route: list[tuple[float, int]] = [(0.0, 0)] * (n + 1)
    for i in range(n - 1, -1, -1):
        # single char: dictionary frequency if known, OOV floor otherwise
        best_lp = _LOGP.get(text[i], _OOV_LOGP) + route[i + 1][0]
        best_j = i + 1
        for j in range(i + 2, min(i + _MAX_WORD, n) + 1):
            lp = _LOGP.get(text[i:j])
            if lp is not None:
                lp += route[j][0]
                if lp > best_lp:
                    best_lp, best_j = lp, j
        route[i] = (best_lp, best_j)
    out: list[str] = []
    i = 0
    while i < n:
        j = route[i][1]
        out.append(text[i:j])
        i = j
    return out
