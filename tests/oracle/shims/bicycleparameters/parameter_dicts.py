"""Parameter dict(s) referenced by the reference's imports. Only
balanceassistv1 (shipped inside the reference's data dir) is actually used;
meijaard2007_browser_jason is imported but unused on our code paths."""

meijaard2007_browser_jason = {}
