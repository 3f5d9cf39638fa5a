"""Chinese word segmentation — forward maximum matching over an
embedded frequency lexicon.

The reference's Chinese analysis chain delegates to the Stanford
segmenter (ivory/core/tokenize/TokenizerFactory.java zh entry,
StanfordChineseTokenizer); that model is environment-blocked here
(no bundled CRF model, no downloads), so this is the DOCUMENTED
SUBSTITUTION beside cjk_bigram: greedy forward maximum matching (FMM)
— the classical dictionary segmentation baseline the CRF segmenters
are measured against — over a small embedded lexicon of frequent
Mandarin words, single-character fallback for anything out of lexicon.

Deterministic by construction: longest lexicon match wins at each
position (max word length 4), ties impossible (a lexicon is a set),
OOV characters advance one char. The lexicon is deliberately small and
readable — extend via register-time injection (`segment_zh(text,
lexicon=...)`) or a custom TokenizerSpec for production vocabularies.
"""

from __future__ import annotations

# Frequent Mandarin words (2-4 chars). Common-vocabulary list assembled
# for this substitution — function words, time/place nouns, and the
# computing/IR domain terms the synthetic corpora use.
ZH_LEXICON: frozenset[str] = frozenset(
    """
我们 你们 他们 她们 这个 那个 这些 那些 自己 大家
什么 怎么 为什么 怎么样 多少 哪里 哪个 如何
因为 所以 但是 可是 虽然 然而 而且 并且 或者 如果 然后 于是
可以 可能 应该 必须 需要 能够 愿意 希望 喜欢 觉得 知道 认为 发现 表示
已经 还是 正在 马上 立刻 刚才 经常 总是 有时 永远
今天 明天 昨天 现在 以前 以后 最近 将来 时间 时候 小时 分钟
中国 北京 上海 世界 国家 政府 城市 农村 地方 环境
工作 学习 学生 学校 老师 大学 教育 研究 科学 技术 知识
朋友 家庭 孩子 父母 生活 健康 医院 医生
公司 银行 市场 经济 产品 服务 管理 发展 社会 历史 文化
语言 文字 文章 音乐 电影 电视 电话 手机 电脑 汽车 火车 飞机
东西 问题 方法 结果 原因 情况 内容 信息 数据 系统 程序 代码
计算机 软件 硬件 网络 互联网 人工智能 机器学习 深度学习
搜索 引擎 搜索引擎 索引 查询 文档 检索 分词 算法 模型 训练 测试
数据库 服务器 用户 文件 页面 链接 排序 统计 分析 处理 计算 存储
天气 春天 夏天 秋天 冬天 动物 植物 自然
开始 结束 进行 使用 提供 得到 进入 出来 回来 起来 下去
""".split()
)

_MAX_WORD = max(len(w) for w in ZH_LEXICON)


def segment_zh(run: str, lexicon: frozenset[str] | None = None) -> list[str]:
    """Segment one contiguous CJK character run by forward maximum
    matching: at each position take the longest lexicon word (up to the
    lexicon's max length), else emit the single character."""
    lex = ZH_LEXICON if lexicon is None else lexicon
    max_w = _MAX_WORD if lexicon is None else max(map(len, lex), default=1)
    out: list[str] = []
    i, n = 0, len(run)
    while i < n:
        match = None
        for ln in range(min(max_w, n - i), 1, -1):
            cand = run[i : i + ln]
            if cand in lex:
                match = cand
                break
        if match is None:
            match = run[i]
        out.append(match)
        i += len(match)
    return out
