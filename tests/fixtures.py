"""Reference-shaped test fixtures (FIXTURES.md)."""

SAMPLE_BIB = """
@article{smith2020,
  title = {A {Great} Study of   Things},
  journal = {Journal of Testing},
  doi = {10.1000/jot.2020.001},
  url = {https://example.com/paper},
}

@article{lee2021,
  title = {"Quoted Title"},
  journaltitle = {Second Journal},
  url = {https://doi.org/10.1000/SJ.2021.XYZ},
}

@article{nodoi2019,
  title = {No DOI here},
  journal = {Nowhere},
}

@article{dup2020,
  title = {Duplicate of Smith},
  booktitle = {Dup Venue},
  howpublished = {http://dx.doi.org/10.1000/JOT.2020.001},
}
"""

JATS_STRUCTURED = """<article>
  <front>
    <article-meta>
      <article-id pub-id-type="pmcid">PMC1234567</article-id>
      <title-group><article-title>Test Article Title</article-title></title-group>
      <abstract>
        <sec><title>Background</title><p>Abstract background text.</p></sec>
        <sec><title>Results</title><p>Abstract results text.</p></sec>
      </abstract>
    </article-meta>
  </front>
  <body>
    <sec>
      <title>introduction</title>
      <p>Intro paragraph one.</p>
      <p>Intro paragraph two.</p>
      <fig><caption><p>NOISE figure caption</p></caption></fig>
      <sec>
        <title>background details</title>
        <p>Nested background text.</p>
      </sec>
    </sec>
    <sec>
      <title>Methods</title>
      <p>Methods text with <italic>markup</italic> inside.</p>
      <table-wrap><table><tr><td>NOISE table</td></tr></table></table-wrap>
    </sec>
  </body>
</article>"""

JATS_LINEARIZE = """<article>
  <front>
    <title-group><article-title>Linearized</article-title></title-group>
    <abstract><p>Flat abstract.</p></abstract>
  </front>
  <body>
    <p>First loose paragraph.</p>
    <p>Second loose paragraph.</p>
    <list>
      <list-item><p>item one</p></list-item>
      <list-item><p>item two</p></list-item>
    </list>
    <disp-quote><p>A quoted block.</p></disp-quote>
    <ref-list><ref><p>NOISE reference</p></ref></ref-list>
  </body>
</article>"""

JATS_ABSTRACT_ONLY = """<article>
  <front>
    <article-id pub-id-type="pmcid">PMC7777777</article-id>
    <title-group><article-title>Abstract Only</article-title></title-group>
    <abstract><p>Just an abstract, no body.</p></abstract>
  </front>
</article>"""

JATS_EMPTY = """<article>
  <front><title-group><article-title>Empty</article-title></title-group></front>
</article>"""

JATS_SUBARTICLE_BODY = """<article>
  <front>
    <title-group><article-title>Sub Article Host</article-title></title-group>
  </front>
  <sub-article>
    <body><sec><title>inner sec</title><p>Sub-article body text.</p></sec></body>
  </sub-article>
</article>"""


def long_jats(n_paragraphs: int = 30) -> str:
    paras = "".join(
        f"<p>Paragraph {i} with enough words to exceed the minimum "
        f"fulltext threshold easily in aggregate.</p>"
        for i in range(n_paragraphs))
    return f"""<article>
  <front>
    <article-id pub-id-type="pmcid">PMC9999999</article-id>
    <title-group><article-title>Long Article</article-title></title-group>
    <abstract><p>Long abstract.</p></abstract>
  </front>
  <body><sec><title>Everything</title>{paras}</sec></body>
</article>"""
