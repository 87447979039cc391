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

* The lexicon is ~990 words, not 120k: out-of-vocabulary runs
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

# -- round-4 expansion: ~250 more frequent words (same public
# common-vocabulary sourcing; frequencies follow the existing buckets).
# Deliberately excluded: 字元 / 阿爾發 — the reference multilang golden
# depends on them being OOV (per-char) exactly as they are for lindera.
_add(20000, "不是", "不能", "不会", "不要", "不同", "不过", "不用",
     "可能", "可是", "应该", "需要", "必须", "当然", "虽然", "然后",
     "而且", "或者", "并且", "关于", "对于", "由于", "为了", "通过",
     "根据", "按照", "其他", "其实", "其中", "这样", "那样", "怎么",
     "多少", "非常", "特别", "比较", "真的", "一定", "一些", "一样",
     "一直", "一般", "每个", "每天", "很多", "许多", "所有", "全部")
_add(12000, "今年", "去年", "明年", "上午", "下午", "晚上", "早上",
     "中午", "星期", "周末", "小时", "分钟", "分鐘", "秒钟", "现代",
     "以前", "以后", "以後", "之前", "之后", "之後", "最近", "未来",
     "未來", "过去", "過去", "开始", "开发", "開發", "结束", "結束",
     "成为", "成為", "变成", "使用", "利用", "发现", "發現", "发生",
     "發生", "出现", "出現", "进行", "進行", "继续", "繼續", "完成",
     "决定", "決定", "选择", "選擇", "准备", "準備", "参加", "參加",
     "帮助", "幫助", "支持", "反对", "反對", "同意", "理解", "解决",
     "解決", "处理", "處理", "提供", "提出", "提高", "增加", "减少",
     "減少", "改变", "改變", "影响", "影響", "控制", "检查", "檢查",
     "测试", "測試", "运行", "運行", "执行", "執行", "安装", "安裝",
     "配置", "部署", "升级", "升級", "下载", "下載", "上传", "上傳")
_add(8000, "方法", "方式", "方面", "方向", "目标", "目標", "目的",
     "原因", "结果", "結果", "情况", "情況", "条件", "條件", "过程",
     "過程", "阶段", "階段", "水平", "程度", "速度", "质量", "質量",
     "数量", "數量", "价格", "價格", "价值", "價值", "成本", "利润",
     "利潤", "收入", "投资", "投資", "银行", "銀行", "货币", "貨幣",
     "贸易", "貿易", "工业", "工業", "农业", "農業", "商业", "商業",
     "企业", "企業", "产品", "產品", "生产", "生產", "消费", "消費",
     "顾客", "顧客", "客户", "客戶", "用户", "用戶", "员工", "員工",
     "经理", "經理", "主任", "领导", "領導", "父母", "母亲", "母親",
     "父亲", "父親", "儿子", "兒子", "女儿", "女兒", "先生", "女士",
     "小姐", "同学", "同學", "同事", "邻居", "鄰居", "身体", "身體",
     "健康", "医院", "醫院", "药物", "藥物", "疾病", "治疗", "治療",
     "感冒", "发烧", "發燒", "休息", "睡觉", "睡覺", "吃饭", "吃飯",
     "喝水", "跑步", "走路", "游泳", "运动", "運動", "比赛", "比賽",
     "足球", "篮球", "籃球", "乒乓球", "羽毛球", "体育", "體育",
     "新闻", "新聞", "报纸", "報紙", "杂志", "雜誌", "节目", "節目",
     "电视", "電視", "广播", "廣播", "广告", "廣告", "媒体", "媒體")
_add(6000, "图书", "圖書", "小说", "小說", "故事", "文章", "作者",
     "读者", "讀者", "写作", "寫作", "阅读", "閱讀", "文字", "词语",
     "詞語", "句子", "段落", "内容", "內容", "主题", "主題", "意思",
     "意义", "意義", "思想", "观点", "觀點", "态度", "態度", "感觉",
     "感覺", "情感", "心情", "记忆", "記憶", "梦想", "夢想", "旅游",
     "旅遊", "旅行", "风光", "風光", "景色", "公园", "公園", "广场",
     "廣場", "街道", "道路", "交通", "汽车", "汽車", "火车", "火車",
     "飞机", "飛機", "轮船", "地铁", "地鐵", "公交", "出租", "骑车",
     "房子", "房间", "房間", "厨房", "廚房", "卧室", "臥室", "客厅",
     "客廳", "桌子", "椅子", "窗户", "门口", "門口", "钥匙", "鑰匙")
_add(6000, "软件", "軟件", "硬件", "硬體", "程序", "代码", "代碼",
     "函数", "函數", "变量", "變量", "算法", "演算法", "内存", "記憶體",
     "硬盘", "硬碟", "服务器", "伺服器", "客户端", "客戶端", "浏览器",
     "瀏覽器", "网站", "網站", "网页", "網頁", "邮件", "郵件", "密码",
     "密碼", "账号", "帳號", "登录", "登錄", "注册", "註冊", "安全",
     "加密", "解密", "备份", "備份", "恢复", "恢復", "版本", "更新",
     "错误", "錯誤", "警告", "日志", "日誌", "调试", "調試", "性能",
     "优化", "優化", "并发", "並發", "分布式", "分佈式", "集群", "叢集")

# -- round-5 expansion: ~230 more frequent words (same public
# common-vocabulary sourcing; frequencies follow the existing buckets).
# Exclusion rules (CLAUDE.md): 字元 / 阿爾發 stay OOV for the reference
# multilang golden, and no new word spans a pinned-golden boundary
# (南京市|长江大桥, 研究|生命|的|起源, 我|来到|北京|清华大学).
_add(12000, "人民", "政策", "法律", "法规", "法規", "规定", "規定",
     "规则", "規則", "体系", "體系", "结构", "結構", "功能", "性质",
     "性質", "特点", "特點", "特征", "特徵", "属性", "屬性", "类型",
     "類型", "种类", "種類", "分类", "分類", "范围", "範圍", "领域",
     "領域", "行业", "行業", "部门", "部門", "机构", "機構", "组织",
     "組織", "团队", "團隊", "项目", "項目", "任务", "任務", "计划",
     "計劃", "方案", "策略", "模式", "框架", "平台", "工具", "设备",
     "設備", "材料", "资源", "資源", "能源", "电力", "電力")
_add(8000, "宣布", "公布", "发布", "發布", "建立", "设立", "設立",
     "成立", "创建", "創建", "创造", "創造", "制造", "製造", "制作",
     "製作", "设计", "設計", "研发", "研發", "分析", "统计", "統計",
     "调查", "調查", "报告", "報告", "描述", "定义", "定義", "解释",
     "解釋", "说明", "說明", "证明", "證明", "显示", "顯示", "表示",
     "表达", "表達", "传播", "傳播", "传递", "傳遞", "发送", "發送",
     "接收", "接受", "拒绝", "拒絕", "允许", "允許", "禁止", "限制",
     "要求", "请求", "請求", "申请", "申請", "批准", "访问", "訪問",
     "查询", "查詢", "查找", "存储", "存儲", "存在", "删除", "刪除",
     "修改", "编辑", "編輯", "复制", "複製", "粘贴", "移动", "移動",
     "排序", "过滤", "過濾", "筛选", "篩選", "匹配", "替换", "替換",
     "插入", "合并", "合併", "拆分", "压缩", "壓縮", "解压", "保护",
     "保護", "维护", "維護", "保持", "保存", "保证", "保證")
_add(8000, "重要", "主要", "基本", "基础", "基礎", "根本", "核心",
     "关键", "關鍵", "直接", "间接", "間接", "明显", "明顯", "显著",
     "顯著", "突出", "普遍", "普通", "特殊", "复杂", "複雜", "简单",
     "簡單", "容易", "困难", "困難", "危险", "危險", "稳定", "穩定",
     "平衡", "公平", "公正", "正确", "正確", "真实", "真實", "积极",
     "積極", "消极", "消極", "主动", "主動", "被动", "被動", "快速",
     "迅速", "缓慢", "緩慢", "重要性", "文本")
_add(8000, "广州", "廣州", "深圳", "天津", "重庆", "重慶", "武汉",
     "武漢", "成都", "西安", "杭州", "苏州", "蘇州", "香港", "澳门",
     "澳門", "台湾", "台灣", "德国", "德國", "法国", "法國", "俄罗斯",
     "俄羅斯", "印度", "韩国", "韓國", "泰国", "泰國", "越南", "欧洲",
     "歐洲", "亚洲", "亞洲", "非洲", "美洲")

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
